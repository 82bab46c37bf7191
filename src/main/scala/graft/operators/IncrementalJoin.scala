package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Meta

/** Incremental view maintenance for a materialized EQUI-JOIN — the
  * dimension-enrichment table (`fact INNER JOIN dim ON fk = pk`) kept
  * current from BOTH sources' change feeds, the join sibling of
  * [[IncrementalAgg]]. The reference's transformer hook admits any
  * Spark SQL (reference src/lambdas/launch_hudi/handler.py:115-116);
  * an enriched join is the other materialization every warehouse user
  * builds by hand on top of a change feed, and at 100 TB a full
  * re-join to refresh it is a corpus scan — maintenance must be
  * delta-proportional.
  *
  * Contract (the many-to-one enrichment shape):
  *  - `on` maps LEFT columns to RIGHT columns (`fk -> pk`); the RIGHT
  *    table must be KEYED EXACTLY by its join columns, so every left
  *    row matches at most one live right row and the view is keyed by
  *    the LEFT table's record key.
  *  - the view's columns are the left table's user columns plus the
  *    right table's non-join user columns (names must be disjoint);
  *    right join-column values are redundant with the left fk columns
  *    and are dropped.
  *  - INNER semantics: a NULL or dangling fk contributes no view row;
  *    a dim arriving late fans its waiting fact rows IN, a dim delete
  *    fans its enriched rows OUT.
  *
  * [[maintain]] advances the view from `(leftFrom → leftTo,
  * rightFrom → rightTo)` in ONE merge commit built from three disjoint
  * delta branches (all three manifest-pruned change feeds, never a
  * source scan on the common path):
  *
  *  1. Δleft ⋈ right@rightTo — changed fact rows re-enrich against the
  *     NEW dim snapshot (so a fact update and its dim's update landing
  *     in the same window agree); an unmatched or deleted fact row
  *     retracts its view row. The dim read is bounded by the delta's
  *     fk set (broadcast at dim scale).
  *  2. dim updates/deletes fan OUT over the view's own rows (the left
  *     columns are already materialized there — the fact table is
  *     never touched), anti-joined against Δleft's keys so branch 1
  *     owns every key it saw.
  *  3. dim INSERTS fan late facts IN: one left@leftTo scan restricted
  *     to the new dim keys (broadcast semi join at scale; skipped
  *     entirely when the window inserts no new dim key), anti-joined
  *     against Δleft likewise.
  *
  * The three branches touch provably disjoint view keys (1 owns Δleft;
  * 2 and 3 exclude it and split by the dim key's net op), so the union
  * is duplicate-free and the whole window lands as ONE atomic merge —
  * both watermarks advance in the same commit as the data
  * ([[LeftSeqKey]]/[[RightSeqKey]]), making a torn apply impossible by
  * construction. A crash simply leaves the previous consistent
  * snapshot; [[maintainLatest]] resumes from the recorded pair.
  *
  * Branch 2 reads the VIEW (pruned by the changed dim keys' fk values
  * through column stats when the view is clustered by fk; a slow-moving
  * dimension makes this the rare path), never the fact table; branch 3
  * reads the fact table only when genuinely-new dim keys arrive.
  */
object IncrementalJoin {

  /** Commit-extra watermarks on the VIEW: the newest left/right source
    * commits whose changes it reflects — written atomically with each
    * bootstrap/maintain commit (a crash between "apply" and "record" is
    * impossible), so [[maintainLatest]] resumes exactly where the last
    * successful application ended. */
  val LeftSeqKey = "ivm_join_left_seq"
  val RightSeqKey = "ivm_join_right_seq"

  /** Self-describing view spec (the [[create]]/[[refresh]] surface):
    * source roots + the fk=pk column map, re-stamped into every
    * maintenance commit so archiving can never strand a view. */
  val LeftRootKey = "ivm_join_left_root"
  val RightRootKey = "ivm_join_right_root"
  val OnKey = "ivm_join_on"
  val JoinTypeKey = "ivm_join_type"
  /** Optional fact-side WHERE predicate (left columns only): the view
    * is `filtered facts ⋈ dim`; a fact row crossing the predicate
    * boundary is a pure add/retract, exactly like the aggregate views'
    * [[IncrementalAgg.WhereKey]] contract. */
  val WhereKey = "ivm_join_where"

  /** INNER: an unmatched fact contributes no row; a dim delete takes
    * its enriched rows with it; a late dim fans waiting facts IN. */
  val Inner = "inner"
  /** LEFT OUTER: every live fact row is in the view, dim columns NULL
    * until (or after) their dim exists — and the dim side gets strictly
    * CHEAPER: every dim op (insert included) is an in-place rewrite of
    * the view rows carrying that key, so a dim-only window never reads
    * the fact table at all. */
  val LeftOuter = "left"

  private val DelCol = "_del"

  /** The view's applied (leftSeq, rightSeq) watermark pair: the newest
    * commit in its timeline carrying both keys. None = not a
    * bootstrapped join view. */
  def appliedSeqs(view: GraftTable): Option[(Long, Long)] =
    view.historyNewestFirst()
      .find(c => c.extra.contains(LeftSeqKey) && c.extra.contains(RightSeqKey))
      .map(c => (c.extra(LeftSeqKey).toLong, c.extra(RightSeqKey).toLong))

  private def requireContract(left: GraftTable, right: GraftTable,
      view: GraftTable, on: Seq[(String, String)]): Unit = {
    require(on.nonEmpty, "at least one fk=pk join column pair")
    require(right.keyFields == on.map(_._2),
      s"the RIGHT table must be keyed exactly by its join columns " +
        s"(key=${right.keyFields.mkString(",")}, on=${on.map(_._2).mkString(",")}) — " +
        "the many-to-one contract that keys the view by the left record key")
    require(view.keyFields == left.keyFields,
      s"the view must be keyed by the LEFT table's record key " +
        s"(view=${view.keyFields.mkString(",")}, left=${left.keyFields.mkString(",")})")
    require(left.globalIndex && view.globalIndex,
      "incremental join views need globally-unique left/view record keys")
  }

  /** A source snapshot reduced to the columns its CHANGE FEED carries:
    * the ordering stamp and tombstone flag are per-source transport
    * columns ([[GraftTable.changesDiffImages]] excludes them from the
    * image structs), so the view must not materialize them either. */
  private def userOf(t: GraftTable, df: DataFrame): DataFrame =
    df.drop(Meta.RecordKey, Meta.CommitSeq, t.orderingField, Meta.Deleted)

  /** Inner-join projection: every left column, then the right table's
    * non-join columns (the right join-column values are redundant with
    * the left fk). */
  private def joined(l: DataFrame, r: DataFrame,
      on: Seq[(String, String)], joinType: String): DataFrame = {
    val cond = on.map { case (lc, rc) => l(lc) === r(rc) }.reduce(_ && _)
    val rKeep = r.columns.filterNot(on.map(_._2).contains).toSeq
    val clash = rKeep.toSet.intersect(l.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names collide: ${clash.mkString(",")} — " +
        "alias one side before creating the join view")
    l.join(r, cond, joinType)
      .select(l.columns.toSeq.map(l(_)) ++ rKeep.map(r(_)): _*)
  }

  private def requireJoinType(joinType: String): Unit =
    require(joinType == Inner || joinType == LeftOuter,
      s"joinType must be '$Inner' or '$LeftOuter': $joinType")

  /** One-time full join of the two snapshots into the (empty) view,
    * recording both watermarks atomically with the data. */
  def bootstrap(left: GraftTable, right: GraftTable, view: GraftTable,
      on: Seq[(String, String)], atLeft: Long, atRight: Long,
      joinType: String = Inner,
      /** Dim columns to MATERIALIZE (beyond the join columns); empty =
        * all. A 3-column enrichment from a wide dimension should not
        * carry the other 197 — [[maintain]] derives the kept set from
        * the view's own schema, so this is a bootstrap-time choice. */
      rightCols: Seq[String] = Seq.empty,
      /** Fact-side predicate (left columns only — loud analysis error
        * otherwise): rows outside it contribute no view row, and an
        * update crossing the boundary adds/retracts exactly. */
      where: Option[String] = None,
      extraMeta: Map[String, String] = Map.empty,
      /** Lay the bootstrap output out SORTED BY THE FK COLUMNS instead
        * of by record key ([[create]] passes this): per-file fk stats
        * then stay narrow, so branch 2's view read prunes to the churned
        * keys' file neighborhood instead of scanning the whole view. The
        * record-key interval trade is covered by the view's key blooms
        * (see [[GraftTable.clusterZOrder]]'s layout note). */
      fkSorted: Boolean = false): Unit = {
    requireContract(left, right, view, on)
    requireJoinType(joinType)
    val l0 = userOf(left, left.readAsOf(atLeft))
    val l = where.fold(l0)(w => l0.filter(expr(w)))
    require(!l.columns.contains(DelCol),
      s"left column '$DelCol' collides with the maintenance marker")
    val r0 = userOf(right, right.readAsOf(atRight))
    val r = if (rightCols.isEmpty) r0
      else r0.select((on.map(_._2) ++ rightCols).distinct.map(col): _*)
    // materialize the join BEFORE the bulk insert: Catalyst's
    // size-only join estimate is a near-product of the sides, which
    // would balloon the write's partition plan to the 32768 cap (a
    // 32k-task range sample + write for ANY view size); the cached
    // relation carries its ACTUAL size, so the file plan is honest.
    // One extra materialization on the one-time bootstrap path only.
    val full = joined(l, r, on, joinType)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      full.count(): Unit
      view.bulkInsert(full, extraMeta = extraMeta +
        (LeftSeqKey -> atLeft.toString) + (RightSeqKey -> atRight.toString),
        layoutSort = if (fkSorted) on.map(p => col(p._1)) else Seq.empty)
      ()
    } finally { full.unpersist(blocking = false); () }
  }

  /** Test observability: (admitted, total) view files of the LAST
    * branch-2 fan-out read that went through stats pruning; None when
    * the last fan-out had no tracked fk stats to prune with. Driver-side
    * and single-writer by the view lock — a plain volatile is enough. */
  @volatile private[graft] var lastFanScan: Option[(Int, Int)] = None

  /** Branch 2's view read: when the view TRACKS COLUMN STATS on every fk
    * column ([[create]] sets that up and lays the bootstrap out
    * fk-sorted), prune the manifest by the churned dim keys' [min, max]
    * box before any task is scheduled — a one-dim-key churn window then
    * scans the key's file neighborhood, not the whole view. The box is
    * computed driver-side from the (delta-bounded, already-pinned) dim
    * image feed; a superset read is always sound because the fan-out
    * join keeps exactly the matching rows. Views without fk stats (the
    * raw [[bootstrap]] surface) keep the full conservative scan. */
  private def viewForFan(view: GraftTable, fanKeys: DataFrame,
      on: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.{sources => sf}
    if (!on.map(_._1).forall(view.statsColumns.contains)) {
      lastFanScan = None
      return view.readUser()
    }
    val bounds = fanKeys.agg(
      struct(on.flatMap { case (_, rc) =>
        Seq(min(col(rc)).as(s"mn_$rc"), max(col(rc)).as(s"mx_$rc")) }: _*).as("b"))
      .select("b.*").head()
    val filters = on.flatMap { case (lc, rc) =>
      val mn = bounds.getAs[Any](s"mn_$rc")
      val mx = bounds.getAs[Any](s"mx_$rc")
      if (mn == null || mx == null) Seq.empty
      else Seq(sf.GreaterThanOrEqual(lc, mn), sf.LessThanOrEqual(lc, mx))
    }
    if (filters.isEmpty) { lastFanScan = None; return view.readUser() }
    val ps = view.readUserPruned(filters)
    lastFanScan = Some((ps.admittedFiles, ps.totalFiles))
    ps.df
  }

  /** Apply both sources' `(from, to]` change feeds to the view as ONE
    * merge commit (see object doc for the three disjoint branches).
    * Idempotence is the caller's contract: apply each window exactly
    * once, in order — enforced under the view's table lock by the
    * watermark preCommit check. */
  def maintain(left: GraftTable, right: GraftTable, view: GraftTable,
      on: Seq[(String, String)], leftFrom: Long, leftTo: Long,
      rightFrom: Long, rightTo: Long,
      joinType: String = Inner,
      where: Option[String] = None,
      extraMeta: Map[String, String] = Map.empty): Unit = {
    requireContract(left, right, view, on)
    requireJoinType(joinType)
    require(leftFrom <= leftTo && rightFrom <= rightTo,
      s"backwards maintenance window (left $leftFrom→$leftTo, right $rightFrom→$rightTo)")
    if (leftFrom == leftTo && rightFrom == rightTo) return
    val lKeys = left.keyFields
    val rNew = userOf(right, right.readAsOf(rightTo))
    val viewCols: Seq[String] = {
      val v = view.latestCommit().getOrElse(throw new IllegalStateException(
        s"join view at ${view.root} has no commits — bootstrap first"))
      org.apache.spark.sql.types.DataType.fromJson(v.schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq
        .filterNot(c => c == Meta.RecordKey || c == Meta.CommitSeq)
    }
    val rKeep = viewCols.filter(c =>
      rNew.columns.contains(c) && !on.exists(_._2 == c))
    val lCols = viewCols.filterNot(rKeep.contains)
    require(!viewCols.contains(DelCol) && !lCols.contains("_wq") &&
      !rNew.columns.contains("_rmatch"),
      "source/view columns collide with the maintenance markers " +
        s"($DelCol/_wq/_rmatch) — rename them before creating the view")

    def imgField(c: String) =
      coalesce(col("_after")(c), col("_before")(c)).as(c)

    // the (delta-bounded) image feeds are consumed several times each —
    // pin them FULLY materialized before any probe (a limit-probe on an
    // unpersisted frame would cache only the partitions it touched and
    // re-run the manifest-pruned diff per consumer), released after the
    // merge lands
    val pinned = scala.collection.mutable.ListBuffer[DataFrame]()
    def pin(df: DataFrame): DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(): Unit
      pinned += p
      p
    }
    try {
    // ---- branch 1: Δleft re-enriched against right@rightTo
    val (srcL, touchedL) = if (leftTo > leftFrom) {
      val img = pin(left.changesDiffImages(leftFrom, leftTo))
      val common = img.schema("_after").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
      require(lCols.forall(common.contains),
        s"left change feed is missing view columns: " +
          lCols.filterNot(common.contains).mkString(","))
      // a maintenance-only source window (cluster/compact commits) has
      // an EMPTY feed: skip the branch — the dim side must not be read
      if (img.isEmpty) (None, None) else {
        val post0 = img.filter(col("op") =!= "D")
          .select(lCols.map(c => col("_after")(c).as(c)): _*)
        // the predicate sees ONLY fact columns (a dim reference fails
        // loudly at analysis); a post-image OUTSIDE the set retracts —
        // a boundary crossing is a pure add/retract, like the filtered
        // aggregate views
        val post = where.fold(post0.withColumn("_wq", lit(true)))(w =>
          post0.withColumn("_wq", coalesce(expr(w), lit(false))))
        val rFlag = rNew.withColumn("_rmatch", lit(true))
        val cond = on.map { case (lc, rc) => post(lc) === rFlag(rc) }.reduce(_ && _)
        val postJ = post.join(rFlag, cond, "left")
          .select(lCols.map(post(_)) ++ rKeep.map(rFlag(_)) :+
            (!post("_wq") ||
              (if (joinType == Inner) rFlag("_rmatch").isNull
               else lit(false))).as(DelCol): _*)
        val dels = img.filter(col("op") === "D")
          .select(lCols.map(c => col("_before")(c).as(c)) ++
            rKeep.map(c => lit(null).as(c)) :+ lit(true).as(DelCol): _*)
        val touched = img.select(lKeys.map(imgField): _*)
        (Some(postJ.unionByName(dels)), Some(touched))
      }
    } else (None, None)
    graft.util.StageTimer.mark("branch_left")

    def antiTouched(df: DataFrame): DataFrame =
      touchedL.fold(df)(t => df.join(t, lKeys, "left_anti"))

    // ---- branches 2+3: Δright fanned over the view / the late facts.
    // Each is built ONLY when its op class is present: an empty small
    // side of a join still schedules the big side's scan (the broadcast
    // join reads every fact/view file to produce zero rows), so a
    // dim-window without inserts must never touch the fact table and a
    // dim-window without updates/deletes must never scan the view.
    val srcR: Option[DataFrame] = if (rightTo > rightFrom) {
      val imgR = pin(right.changesDiffImages(rightFrom, rightTo))
      val rCommon = imgR.schema("_after").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
      require((rKeep ++ on.map(_._2)).forall(rCommon.contains),
        s"right change feed is missing view columns: " +
          (rKeep ++ on.map(_._2)).filterNot(rCommon.contains).mkString(","))
      val branches: Option[DataFrame] = if (joinType == LeftOuter) {
        // LEFT OUTER: every fact row is already IN the view (dim side
        // possibly NULL), so EVERY dim op — insert, update, delete — is
        // an in-place rewrite of the view rows carrying that key: new
        // values from _after (NULL for a delete, exactly the LEFT
        // semantics). A dim-only window never reads the fact table.
        if (imgR.isEmpty) None else {
          val fanR = imgR.select(on.map(_._2).map(imgField) ++
            rKeep.map(c => col("_after")(c).as(c)): _*)
          val v = viewForFan(view, fanR, on)
          val fanCond = on.map { case (lc, rc) => v(lc) === fanR(rc) }.reduce(_ && _)
          Some(v.join(fanR, fanCond, "inner")
            .select(lCols.map(v(_)) ++ rKeep.map(fanR(_)) :+
              lit(false).as(DelCol): _*))
        }
      } else {
      // updates rewrite the dim side of matching view rows in place;
      // deletes retract them — the fact table is never read
      val fanned = if (imgR.filter(col("op") =!= "I").isEmpty) None else {
        val duR = imgR.filter(col("op") =!= "I").select(
          on.map(_._2).map(imgField) ++
            rKeep.map(c => col("_after")(c).as(c)) :+
            (col("op") === "D").as(DelCol): _*)
        val v = viewForFan(view, duR, on)
        val duCond = on.map { case (lc, rc) => v(lc) === duR(rc) }.reduce(_ && _)
        Some(v.join(duR, duCond, "inner")
          .select(lCols.map(v(_)) ++ rKeep.map(duR(_)) :+ duR(DelCol): _*))
      }
      // new dim keys fan their waiting facts in: the one left read,
      // restricted to the inserted keys, skipped when there are none
      val lateFacts = if (imgR.filter(col("op") === "I").isEmpty) None else {
        val insR = imgR.filter(col("op") === "I")
          .select(rCommon.map(c => col("_after")(c).as(c)): _*)
        val lNew0 = userOf(left, left.readAsOf(leftTo))
        val lNew = where.fold(lNew0)(w => lNew0.filter(expr(w)))
        Some(joined(lNew, insR, on, Inner)
          .select(viewCols.map(col) :+ lit(false).as(DelCol): _*))
      }
      (fanned.toSeq ++ lateFacts.toSeq).reduceOption(_ unionByName _)
      }
      branches.map(antiTouched)
    } else None
    graft.util.StageTimer.mark("branch_right")

    // an all-empty window (both feeds maintenance-only) still commits:
    // the watermarks must advance so ranges compose — limit(0) is
    // planner-only, no scan
    val emptySrc = view.readUser().limit(0)
      .select(viewCols.map(col): _*).withColumn(DelCol, lit(false))
    val src = (srcL.toSeq ++ srcR.toSeq)
      .reduceOption(_ unionByName _).getOrElse(emptySrc)
    val nonKey = viewCols.filterNot(view.keyFields.contains)
    view.mergeInto(src,
      whenMatchedSet = nonKey.map(c => c -> col(s"src_$c")).toMap,
      whenMatchedDelete = Some(col(s"src_$DelCol")),
      insertWhenNotMatched = true,
      insertWhenNotMatchedCond = Some(!col(s"src_$DelCol")),
      extraMeta = extraMeta +
        (LeftSeqKey -> leftTo.toString) + (RightSeqKey -> rightTo.toString),
      // exactly-once under concurrent refreshers: validated under the
      // VIEW's table lock, so a racing refresh that already applied this
      // (or a newer) window refuses instead of double-applying
      preCommit = Some(() => {
        val cur = appliedSeqs(view)
        if (cur != Some((leftFrom, rightFrom))) throw new IllegalStateException(
          s"stale join maintenance window (left $leftFrom→$leftTo, right " +
            s"$rightFrom→$rightTo): the view's applied watermark is " +
            s"${cur.getOrElse("absent")} — bootstrap first / re-read the " +
            "watermark (concurrent refresh?)")
      }))
    graft.util.StageTimer.mark("merge")
    ()
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** Catch the view up to both sources' current heads from the recorded
    * watermark pair — IDEMPOTENT (a no-op when already current) and
    * atomic (one merge commit carries data + both watermarks). Refuses
    * loudly when either source was rolled back below its watermark. */
  def maintainLatest(left: GraftTable, right: GraftTable, view: GraftTable,
      on: Seq[(String, String)], joinType: String = Inner,
      where: Option[String] = None,
      extraMeta: Map[String, String] = Map.empty): (Long, Long) = {
    val (lf, rf) = appliedSeqs(view).getOrElse(throw new IllegalStateException(
      s"view carries no $LeftSeqKey/$RightSeqKey watermarks — bootstrap first"))
    def head(t: GraftTable, side: String, from: Long): Long = {
      val to = t.latestCommit().map(_.seq).getOrElse(
        throw new IllegalStateException(s"$side table has no commits"))
      if (to < from) throw new IllegalStateException(
        s"$side head $to is BELOW the view's applied watermark $from — the " +
          s"$side source was rolled back or restored past the view's state; " +
          "re-bootstrap the view against the restored source")
      to
    }
    val lt = head(left, "left", lf)
    val rt = head(right, "right", rf)
    maintain(left, right, view, on, lf, lt, rf, rt, joinType, where, extraMeta)
    (lt, rt)
  }

  /** Create a SELF-DESCRIBING materialized join view at `location`:
    * keyed by the left record key, bootstrapped at both sources'
    * current heads, with the spec (roots + fk=pk map) recorded in the
    * bootstrap commit so [[refresh]] — and the `CALL refresh_join_view`
    * SQL surface — needs only the view itself. */
  def create(spark: SparkSession, left: GraftTable, right: GraftTable,
      location: String, on: Seq[(String, String)],
      joinType: String = Inner, rightCols: Seq[String] = Seq.empty,
      where: Option[String] = None,
      targetFileBytes: Long = GraftTable.DefaultTargetFileBytes): GraftTable = {
    requireJoinType(joinType)
    on.foreach { case (lc, rc) =>
      Seq(lc, rc).foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"bad join column name: $c — join columns must be plain identifiers"))
    }
    // fk-clustered by default (round-15 verdict #5): track column stats
    // on the fk columns and lay the bootstrap out fk-sorted, so branch
    // 2's dim-churn fan-out prunes the view to the churned keys' file
    // neighborhood; key blooms keep the merge path's write pruning tight
    // despite the non-key layout (the clusterZOrder trade, pre-paid)
    val view = new GraftTable(spark, location, left.keyFields,
      targetFileBytes = targetFileBytes,
      statsColumns = on.map(_._1), keyBlooms = true,
      clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes,
      // small-file folds must PRESERVE the fk layout (key order would
      // silently widen the fan-out read's fk stats boxes)
      clusterSortColumns = on.map(_._1))
    require(view.history().isEmpty,
      s"$location already holds a committed table — create_join_view needs a fresh location")
    val atL = left.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("left table has no commits"))
    val atR = right.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("right table has no commits"))
    val w = where.map(_.trim).filter(_.nonEmpty)
    bootstrap(left, right, view, on, atL, atR, joinType, rightCols, w,
      extraMeta = specMeta(left, right, on, joinType, w), fkSorted = true)
    // table→view registration on BOTH sources: either side committing
    // under `viewMaintain` refreshes the enrichment hands-free
    left.registerDependentView(view.root)
    right.registerDependentView(view.root)
    view
  }

  private def specMeta(left: GraftTable, right: GraftTable,
      on: Seq[(String, String)], joinType: String,
      where: Option[String]): Map[String, String] =
    Map(LeftRootKey -> left.root, RightRootKey -> right.root,
      OnKey -> on.map { case (l, r) => s"$l=$r" }.mkString(","),
      JoinTypeKey -> joinType) ++ where.map(WhereKey -> _)

  private[graft] def specOf(view: GraftTable): Option[Map[String, String]] =
    view.historyNewestFirst().find(_.extra.contains(LeftRootKey)).map(_.extra)

  /** Catch a [[create]]d view up to both sources' heads using nothing
    * but the spec in its own timeline (re-stamped into each maintenance
    * commit). Returns the applied ((leftFrom, leftTo), (rightFrom,
    * rightTo)). */
  def refresh(spark: SparkSession, view: GraftTable): ((Long, Long), (Long, Long)) = {
    val spec = specOf(view).getOrElse(throw new IllegalStateException(
      s"no $LeftRootKey spec in the view's timeline — not a created join view"))
    val left = GraftTable.open(spark, spec(LeftRootKey))
    val right = GraftTable.open(spark, spec(RightRootKey))
    val on = spec(OnKey).split(",").toSeq.map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }
    // pre-JoinTypeKey specs are inner views by construction
    val joinType = spec.getOrElse(JoinTypeKey, Inner)
    val where = spec.get(WhereKey)
    val (lf, rf) = appliedSeqs(view).get
    val (lt, rt) = maintainLatest(left, right, view, on, joinType, where,
      extraMeta = specMeta(left, right, on, joinType, where))
    ((lf, lt), (rf, rt))
  }
}
