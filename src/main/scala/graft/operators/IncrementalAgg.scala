package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{KeyGen, Meta}

/** The maintained measure set of an incremental aggregate view: named
  * SUM / MIN / MAX expressions over source columns (plus the implicit
  * live-row COUNT column `n`). Names must be distinct across all three
  * families and must not collide with `n` or a group column. */
case class Measures(sums: Map[String, Column] = Map.empty,
    mins: Map[String, Column] = Map.empty,
    maxs: Map[String, Column] = Map.empty,
    /** AVG measures: maintained as two physical SUM columns
      * (`<m>_sum` = the expression, `<m>_cnt` = its non-null count) and
      * DERIVED on read ([[IncrementalAgg.readView]]) as
      * `<m> = <m>_sum / <m>_cnt` in DOUBLE — exact from existing state,
      * no new maintenance machinery. */
    avgs: Map[String, Column] = Map.empty,
    /** Exact COUNT(DISTINCT expr) measures: maintained through a
      * per-(group, value) auxiliary count table (see
      * [[IncrementalAgg.auxTable]]) by the same retract/add merge — a
      * value's live count reaching zero retracts it from the distinct
      * set, the standard IVM construction. Values compare by their
      * STRING rendering (injective for the string/integral/decimal
      * columns distinct counts are taken over). */
    dcounts: Map[String, Column] = Map.empty) {
  def names: Seq[String] =
    (sums.keys ++ mins.keys ++ maxs.keys ++ avgs.keys ++ dcounts.keys)
      .toSeq.sorted
  require(names.distinct.size == names.size && !names.contains("n"),
    s"measure names must be distinct and not 'n': $names")
  // the underscore prefix is the maintenance plan's internal namespace
  // (_sgn, _dirty, _add_/_ret_/_cur_/_curd_/_rec_/_abs_<m>) — refuse at
  // construction instead of failing with an ambiguous-column analysis
  // error mid-run
  require(names.forall(!_.startsWith("_")),
    s"measure names may not start with '_' (reserved): $names")
  // AVG state columns are stored physically — their names must be free
  private val avgState = avgs.keys.toSeq.flatMap(m => Seq(s"${m}_sum", s"${m}_cnt"))
  require(avgState.intersect(names).isEmpty,
    s"AVG state columns collide with measure names: " +
      avgState.intersect(names).mkString(","))
}

/** Incremental view maintenance for grouped COUNT/SUM/MIN/MAX aggregates
  * over a keyed [[GraftTable]] — the materialized-view pattern a
  * warehouse user builds by hand on top of a change feed (Hudi
  * incremental query → MERGE, Delta CDF → foreachBatch), packaged as one
  * operator.
  *
  * The materialized aggregate is itself a [[GraftTable]] KEYED BY THE
  * GROUP COLUMNS, so maintenance lands as an ordinary engine MERGE and
  * readers get snapshot isolation, time travel, and SQL access for free.
  *
  * Scale contract (the 100-TB lever): [[maintain]] reads ONLY the
  * manifest-pruned change neighborhood of `(fromSeq, toSeq]`
  * ([[GraftTable.changesDiffImages]]) and MERGEs only the groups whose
  * aggregate actually moved — work is proportional to the delta, never
  * the source table or the full group count. A deleted key RETRACTS its
  * before-image contribution; an update retracts the before-image and
  * adds the after-image (group migration included: the two images may
  * land in different groups); a group whose count reaches zero is
  * deleted from the aggregate.
  *
  * MIN/MAX are not retractable by arithmetic: an arriving value folds
  * in exactly through `least`/`greatest`, but retracting the CURRENT
  * extreme leaves the next-best unknown. Maintenance therefore marks a
  * group DIRTY only when a retracted value ties the stored extreme and
  * recomputes exactly the dirty groups from the source snapshot (one
  * scan, restricted by a semi join — skipped entirely when no
  * retraction touches an extreme, which is the common path).
  *
  * AVG measures desugar to two stored SUM columns (`<m>_sum`,
  * `<m>_cnt`) and derive on read ([[IncrementalAgg.readView]]); exact
  * COUNT(DISTINCT) measures maintain a per-(group, value) auxiliary
  * count table under the view's root — a value's live count reaching
  * zero retracts it from the distinct set (the standard IVM
  * construction), and the view's distinct columns are re-derived as
  * ABSOLUTE counts of the touched groups' live aux rows, which is what
  * makes the two-table commit sequence crash-safe.
  *
  * SUM measures should be EXACT types (integral or decimal):
  * incremental +/- is associative for them, so the maintained value
  * equals a full recompute bit for bit. Floating-point sums would drift
  * from a recompute by non-associativity — cast to decimal first. Null
  * measures contribute nothing (SQL semantics); a group whose every sum
  * value is later removed keeps sum 0 where a recompute reports NULL —
  * the one documented deviation (MIN/MAX recompute exactly, including
  * back to NULL).
  */
object IncrementalAgg {

  /** Commit-extra key on the AGGREGATE table recording the newest source
    * commit whose changes it reflects — written atomically with each
    * bootstrap/maintain commit, so a crash between "apply" and "record"
    * is impossible by construction and [[maintainLatest]] resumes
    * exactly where the last successful application ended. */
  val AppliedSeqKey = "ivm_applied_seq"

  /** The aggregate's applied-source-commit watermark: the newest commit
    * in its timeline carrying [[AppliedSeqKey]] (maintenance commits on
    * the aggregate itself — compaction, clustering — don't carry it and
    * are skipped). None = never bootstrapped. */
  def appliedSeq(agg: GraftTable): Option[Long] =
    agg.historyNewestFirst()
      .flatMap(_.extra.get(AppliedSeqKey)).map(_.toLong).nextOption()

  /** Bootstrap-commit extra keys carrying the SELF-DESCRIBING view
    * spec: source table root, group columns (csv), and measures
    * (`name=sql-expr` for SUM, `name=min:sql-expr` / `name=max:sql-expr`
    * for extremes, joined by `;`). [[refresh]] rebuilds the whole
    * maintenance call from them, so a view created once (API or `CALL
    * create_agg_view`) refreshes from nothing but its own timeline. */
  val SrcRootKey = "ivm_src_root"
  val GroupsKey = "ivm_groups"
  val SumsKey = "ivm_sums"

  /** Optional view predicate (Spark SQL boolean over SOURCE columns):
    * the view maintains the aggregate of `SELECT ... WHERE <pred>`.
    * Applied identically to the bootstrap snapshot, to BOTH contribution
    * sides of the change feed (a row whose update moves it across the
    * predicate boundary is a pure add/retract even when its group didn't
    * change), and to the dirty-group extremes recompute. */
  val WhereKey = "ivm_where"

  /** Point-pruned state reads collect at most this many delta group
    * keys to the driver; a wider delta falls back to the full state
    * scan (at that width the scan is delta-proportional anyway). */
  val StateKeyCap = 10000

  /** Value / live-count column names of a COUNT(DISTINCT) auxiliary
    * table: (group cols..., [[DvCol]]) → [[CntCol]]. */
  val DvCol = "_ivm_dv"
  val CntCol = "cnt"

  /** The auxiliary per-(group, value) count table backing an exact
    * COUNT(DISTINCT) measure — an ordinary keyed [[GraftTable]] at
    * `<view root>/_ivm_dv_<measure>` (beside the view's `data/`
    * directory, so fsck's orphan walk and readers never see it). It
    * carries its OWN [[AppliedSeqKey]] watermark, committed before the
    * view's: a crash between the two commits resumes by skipping the
    * already-applied aux merge and re-deriving the view's distinct
    * columns from the aux ABSOLUTE state (idempotent by construction).
    * NOTE a [[GraftTable.cloneTo]] of the view does not carry its aux
    * tables — re-bootstrap a cloned dcount view. */
  private[graft] def auxTable(spark: SparkSession, agg: GraftTable,
      groupCols: Seq[String], m: String): GraftTable =
    new GraftTable(spark, s"${agg.root}/_ivm_dv_$m", groupCols :+ DvCol,
      targetFileBytes = agg.targetFileBytes,
      clusterSmallFileBytes = agg.clusterSmallFileBytes)

  /** The physically-stored SUM columns: declared sums plus each AVG
    * measure's `<m>_sum` / `<m>_cnt` state pair (the non-null count is
    * itself a signed sum, so AVG rides the existing exact-sum path). */
  private def effSums(meas: Measures): Map[String, Column] =
    meas.sums ++ meas.avgs.flatMap { case (m, e) =>
      Seq(s"${m}_sum" -> e,
        s"${m}_cnt" -> when(e.isNotNull, lit(1L)).otherwise(lit(0L))) }

  private def requireAuxColumnsFree(meas: Measures, groupCols: Seq[String]): Unit =
    if (meas.dcounts.nonEmpty)
      require(!groupCols.contains(CntCol) && !groupCols.contains(DvCol),
        s"group columns may not be named '$CntCol'/'$DvCol' when a COUNT " +
          "DISTINCT measure is declared (auxiliary-table column clash)")

  /** Read the view with DERIVED measure columns materialized: each AVG
    * measure appears as `<m> = <m>_sum / <m>_cnt` in DOUBLE (NULL when
    * the group holds no non-null values), internal state columns
    * hidden; COUNT/SUM/MIN/MAX/COUNT-DISTINCT columns pass through. */
  def readView(agg: GraftTable, meas: Measures): DataFrame = {
    val base = agg.readUser()
    val withAvg = meas.avgs.keys.toSeq.sorted.foldLeft(base)((d, m) =>
      d.withColumn(m, when(col(s"${m}_cnt") > 0,
        col(s"${m}_sum").cast("double") / col(s"${m}_cnt"))))
    withAvg.drop(meas.avgs.keys.toSeq.flatMap(m =>
      Seq(s"${m}_sum", s"${m}_cnt")): _*)
  }

  private def requireKeyedByGroups(agg: GraftTable, groupCols: Seq[String]): Unit =
    require(agg.keyFields == groupCols,
      s"the aggregate table must be KEYED BY the group columns " +
        s"(key=${agg.keyFields.mkString(",")}, groups=${groupCols.mkString(",")})")

  /** NULL group values are REFUSED LOUDLY: the aggregate is keyed by the
    * group columns, and a NULL group breaks both the state read's
    * null-unsafe equi-join and (for string groups) the record key itself,
    * so the merge would insert a fresh partial-delta row per epoch and
    * the view would silently diverge from a recompute. The check runs on
    * the GROUPED frame (≤ one row per touched group — delta-proportional,
    * never a source scan). Model missing groups with an explicit sentinel
    * (`coalesce(col, lit("<none>"))`) in the view's group expression. */
  private def requireNoNullGroups(grouped: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], where: String): Unit = {
    val anyNull = groupCols.map(col(_).isNull).reduce(_ || _)
    if (grouped.filter(anyNull).limit(1).count() > 0)
      throw new IllegalStateException(
        s"NULL group key in $where: incremental aggregate views refuse " +
          s"NULL values in the group columns (${groupCols.mkString(",")}) — " +
          "a NULL group cannot round-trip through the keyed state merge. " +
          "Wrap the group expression in coalesce(..., <sentinel>) in the " +
          "view definition instead.")
  }

  private def parseMeasures(specs: Seq[(String, String)]): Measures =
    specs.foldLeft(Measures()) { case (acc, (n, e)) =>
      if (e.startsWith("min:")) acc.copy(mins = acc.mins + (n -> expr(e.drop(4))))
      else if (e.startsWith("max:")) acc.copy(maxs = acc.maxs + (n -> expr(e.drop(4))))
      else if (e.startsWith("avg:")) acc.copy(avgs = acc.avgs + (n -> expr(e.drop(4))))
      else if (e.startsWith("dcount:"))
        acc.copy(dcounts = acc.dcounts + (n -> expr(e.drop(7))))
      else acc.copy(sums = acc.sums + (n -> expr(e)))
    }

  /** One-time full aggregate of the source snapshot at commit `atSeq`
    * into the (empty) aggregate table: group columns, `n` (live row
    * count), and one column per named measure. */
  def bootstrap(src: GraftTable, agg: GraftTable, groupCols: Seq[String],
      meas: Measures, atSeq: Long,
      extraMeta: Map[String, String] = Map.empty,
      where: Option[String] = None): Unit = {
    require(meas.names.intersect(groupCols).isEmpty,
      s"measure names collide with group columns: ${meas.names.intersect(groupCols).mkString(",")}")
    requireKeyedByGroups(agg, groupCols)
    requireAuxColumnsFree(meas, groupCols)
    val snap0 = src.readAsOf(atSeq).drop(Meta.RecordKey, Meta.CommitSeq)
    val snap = where.fold(snap0)(w => snap0.filter(expr(w)))
    val sumsAll = effSums(meas)
    val dNames = meas.dcounts.keys.toSeq.sorted
    val aggs = sumsAll.keys.toSeq.sorted.map(m => sum(sumsAll(m)).as(m)) ++
      meas.mins.keys.toSeq.sorted.map(m => min(meas.mins(m)).as(m)) ++
      meas.maxs.keys.toSeq.sorted.map(m => max(meas.maxs(m)).as(m)) ++
      dNames.map(m => countDistinct(meas.dcounts(m).cast("string")).as(m))
    val full = snap.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      requireNoNullGroups(full, groupCols, "the bootstrap snapshot")
      // COUNT(DISTINCT) aux state first (one extra source pass per
      // measure): per-(group, value) live counts. The view's watermark
      // commit comes LAST, so a crash mid-bootstrap leaves a view that
      // simply re-bootstraps (overwriting any partial aux state).
      dNames.foreach { m =>
        val aux = auxTable(full.sparkSession, agg, groupCols, m)
        val e = meas.dcounts(m).cast("string")
        val auxRows = snap.filter(e.isNotNull)
          .groupBy((groupCols.map(col) :+ e.as(DvCol)): _*)
          .agg(count(lit(1)).as(CntCol))
        if (aux.history().isEmpty)
          aux.bulkInsert(auxRows, extraMeta = Map(AppliedSeqKey -> atSeq.toString))
        else aux.insertOverwriteTable(auxRows,
          extraMeta = Map(AppliedSeqKey -> atSeq.toString))
      }
      agg.bulkInsert(full,
        extraMeta = extraMeta + (AppliedSeqKey -> atSeq.toString))
    } finally { full.unpersist(blocking = false); () }
  }

  /** Create a SELF-DESCRIBING materialized aggregate view at `location`:
    * keyed by the group columns, bootstrapped at the source's current
    * head, with the view spec (source root, groups, measure SQL)
    * recorded in the bootstrap commit so [[refresh]] — and the `CALL
    * refresh_agg_view` SQL surface — needs only the view itself. */
  def create(spark: SparkSession, src: GraftTable,
      location: String, groupCols: Seq[String],
      sumSpecs: Seq[(String, String)],
      where: Option[String] = None): GraftTable = {
    sumSpecs.foreach { case (n, e) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad measure name: $n")
      require(!e.contains(";"), s"measure expression may not contain ';': $e")
      require(n != "n", "measure name 'n' collides with the count column")
    }
    require(groupCols.nonEmpty, "at least one group column")
    // the spec encodes groups as unescaped csv (GroupsKey) — hold the
    // names to the same identifier grammar as measure names so the
    // encoding is safe by construction (a backticked name containing
    // ',' or ';' would mis-split on refresh)
    groupCols.foreach(g => require(g.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad group column name: $g — create_agg_view group columns must " +
        "be plain identifiers; alias exotic names in a view first"))
    val agg = new GraftTable(spark, location, groupCols,
      clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes)
    require(agg.history().isEmpty,
      s"$location already holds a committed table — create_agg_view needs a fresh location")
    val at = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    val w = where.map(_.trim).filter(_.nonEmpty)
    bootstrap(src, agg, groupCols, parseMeasures(sumSpecs), at,
      extraMeta = Map(SrcRootKey -> src.root,
        GroupsKey -> groupCols.mkString(","),
        SumsKey -> sumSpecs.map { case (n, e) => s"$n=$e" }.mkString(";")) ++
        w.map(WhereKey -> _),
      where = w)
    // table→view registration (the reverse of the spec): a `viewMaintain`
    // source refreshes this view hands-free after each of its commits
    src.registerDependentView(agg.root)
    agg
  }

  /** Catch a [[create]]d view up to its source's head using nothing but
    * the spec in its own timeline. Each refresh RE-STAMPS the spec into
    * its maintenance commit, so timeline archiving can never strand a
    * view by aging out the bootstrap commit that carried it. Returns
    * (fromSeq, toSeq) applied. */
  def refresh(spark: SparkSession, agg: GraftTable): (Long, Long) = {
    val spec = agg.historyNewestFirst()
      .find(_.extra.contains(SrcRootKey)).map(_.extra).getOrElse(
        throw new IllegalStateException(
          s"no $SrcRootKey spec in the view's timeline — not a created agg view"))
    val src = GraftTable.open(spark, spec(SrcRootKey))
    val groupCols = spec(GroupsKey).split(",").toSeq
    val meas = parseMeasures(
      spec(SumsKey).split(";").filter(_.nonEmpty).toSeq.map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i) -> kv.substring(i + 1)
      })
    val where = spec.get(WhereKey)
    val from = appliedSeq(agg).get
    val to = maintainLatest(src, agg, groupCols, meas,
      extraMeta = Map(SrcRootKey -> spec(SrcRootKey),
        GroupsKey -> spec(GroupsKey), SumsKey -> spec(SumsKey)) ++
        where.map(WhereKey -> _),
      where = where)
    (from, to)
  }

  /** Refresh a view AND its ancestry: when the view's recorded source
    * is itself a created agg view, the parent refreshes FIRST
    * (recursively, depth-bounded, cycle-refused), so one call on a
    * rollup can never read a fresh child of a stale parent. Returns the
    * applied (root, fromSeq, toSeq) per level, parents first — the
    * `CALL refresh_agg_view` SQL surface rides this. */
  def refreshCascade(spark: SparkSession, agg: GraftTable,
      maxDepth: Int = 10): Seq[(String, Long, Long)] = {
    def specOf(t: GraftTable): Option[Map[String, String]] =
      t.historyNewestFirst().find(_.extra.contains(SrcRootKey)).map(_.extra)
    // a parent may be EITHER created-view kind: an aggregate over an
    // enriched join view (the rollup-over-enrichment stack) cascades
    // through the join level exactly like an agg-over-agg chain; a
    // join level reports its LEFT source range (the fact side)
    def walkAny(t: GraftTable, seen: Set[String], depth: Int): Seq[(String, Long, Long)] = {
      require(depth <= maxDepth,
        s"view chain deeper than $maxDepth levels at ${t.root} — cycle?")
      require(!seen.contains(t.root), s"cyclic view chain at ${t.root}")
      def maybeWalk(src: GraftTable): Seq[(String, Long, Long)] =
        if (specOf(src).isDefined || IncrementalJoin.specOf(src).isDefined)
          walkAny(src, seen + t.root, depth + 1)
        else Seq.empty
      specOf(t) match {
        case Some(spec) =>
          val parents = maybeWalk(GraftTable.open(spark, spec(SrcRootKey)))
          val (from, to) = refresh(spark, t)
          parents :+ ((t.root, from, to))
        case None =>
          val jspec = IncrementalJoin.specOf(t).getOrElse(
            throw new IllegalStateException(
              s"no view spec in ${t.root}'s timeline — not a created view"))
          val parents =
            maybeWalk(GraftTable.open(spark, jspec(IncrementalJoin.LeftRootKey))) ++
              maybeWalk(GraftTable.open(spark, jspec(IncrementalJoin.RightRootKey)))
          val ((lf, lt), _) = IncrementalJoin.refresh(spark, t)
          parents :+ ((t.root, lf, lt))
      }
    }
    walkAny(agg, Set.empty, 0)
  }

  /** Catch the aggregate up to the source's current head from the
    * recorded watermark — IDEMPOTENT (a no-op returning the head when
    * already current) and crash-safe (the new watermark lands in the
    * same commit as the delta application). The per-epoch call a
    * streaming ingest loop makes to keep a materialized view live. */
  def maintainLatest(src: GraftTable, agg: GraftTable, groupCols: Seq[String],
      meas: Measures, extraMeta: Map[String, String] = Map.empty,
      where: Option[String] = None): Long = {
    val from = appliedSeq(agg).getOrElse(throw new IllegalStateException(
      s"aggregate table carries no $AppliedSeqKey watermark — bootstrap first"))
    val to = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    if (to < from) throw new IllegalStateException(
      s"source head $to is BELOW the view's applied watermark $from — " +
        "the source was rolled back or restored past the view's state; " +
        "the maintained aggregate reflects commits that no longer exist " +
        "and must be re-bootstrapped against the restored source")
    if (to > from) maintain(src, agg, groupCols, meas, from, to, extraMeta, where)
    to
  }

  /** Apply the source's `(fromSeq, toSeq]` change feed to the aggregate
    * table. Idempotence is the caller's contract: apply each commit
    * range exactly once, in order (the ranges compose: (a,b] then (b,c]
    * ends in the same state as (a,c]). */
  def maintain(src: GraftTable, agg: GraftTable, groupCols: Seq[String],
      meas: Measures, fromSeq: Long, toSeq: Long,
      extraMeta: Map[String, String] = Map.empty,
      where: Option[String] = None): Unit = {
    require(meas.names.intersect(groupCols).isEmpty,
      s"measure names collide with group columns: ${meas.names.intersect(groupCols).mkString(",")}")
    requireKeyedByGroups(agg, groupCols)
    requireAuxColumnsFree(meas, groupCols)
    val sumsAll = effSums(meas)
    val sumNames = sumsAll.keys.toSeq.sorted
    val minNames = meas.mins.keys.toSeq.sorted
    val maxNames = meas.maxs.keys.toSeq.sorted
    val extNames = minNames ++ maxNames
    val dNames = meas.dcounts.keys.toSeq.sorted
    def extExpr(m: String): Column = meas.mins.getOrElse(m, meas.maxs(m))
    val img = src.changesDiffImages(fromSeq, toSeq)
    val idCols = img.columns.filter(c =>
      c != "op" && c != "_before" && c != "_after").toSeq
    val common = img.schema("_after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    // signed contribution rows: retract before-images (D/U), add
    // after-images (I/U); group columns may name id columns (top-level,
    // identical on both sides) or image columns
    def side(s: String, ops: Seq[String], sgn: Int): DataFrame =
      img.filter(col("op").isin(ops.map(x => x: Any): _*))
        .select((common.map(c => col(s)(c).as(c)) ++ idCols.map(col)) :+
          lit(sgn.toLong).as("_sgn"): _*)
    // the view predicate applies to EACH contribution side: an update
    // that carries a row across the predicate boundary keeps exactly one
    // of its two images, becoming a pure add (entered the set) or a pure
    // retract (left it) — group migration and boundary migration compose
    val rows0 = side("_before", Seq("D", "U"), -1)
      .unionByName(side("_after", Seq("I", "U"), 1))
    val rows1 = where.fold(rows0)(w => rows0.filter(expr(w)))
    // COUNT(DISTINCT) maintenance re-reads the contribution rows once
    // per measure (its per-(group, value) delta) — cache them so the
    // change feed is scanned once, not once per consumer
    val rows = if (dNames.isEmpty) rows1
      else rows1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val added = col("_sgn") > 0
    val delta0 = rows.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_sgn")).as("n"),
        sumNames.map(m => sum(sumsAll(m) * col("_sgn")).as(m)) ++
          minNames.flatMap(m => Seq(
            min(when(added, extExpr(m))).as(s"_add_$m"),
            min(when(!added, extExpr(m))).as(s"_ret_$m"))) ++
          maxNames.flatMap(m => Seq(
            max(when(added, extExpr(m))).as(s"_add_$m"),
            max(when(!added, extExpr(m))).as(s"_ret_$m"))): _*)
    val sumsMoved = sumNames.map(m => col(m) =!= 0)
      .foldLeft(col("n") =!= 0)(_ || _)
    // materialize the (changed-group-bounded) delta FULLY before any
    // probe: a limit-probe on an unpersisted frame would cache only
    // the partitions it touched and re-run the change-feed scan for
    // the merge
    val p0 = delta0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p0.count(): Unit
    val release: () => Unit = () => {
      p0.unpersist(blocking = false)
      if (dNames.nonEmpty) rows.unpersist(blocking = false)
      ()
    }
    try {
      requireNoNullGroups(p0, groupCols, s"the ($fromSeq, $toSeq] change feed")
      // exact COUNT(DISTINCT): apply each measure's per-(group, value)
      // signed delta to its auxiliary table (its OWN watermark commit —
      // see auxTable's crash contract), then derive the ABSOLUTE
      // distinct count of every touched group from the aux live rows
      val dabs: Map[String, DataFrame] = dNames.map { m =>
        val aux = auxTable(p0.sparkSession, agg, groupCols, m)
        val auxApplied = appliedSeq(aux).getOrElse(
          throw new IllegalStateException(
            s"COUNT DISTINCT aux table for '$m' carries no watermark — " +
              "bootstrap the view first"))
        val e = meas.dcounts(m).cast("string")
        if (auxApplied != toSeq) {
          // (an aux already at toSeq is the crash-resume case: its merge
          // landed, the view commit didn't — skip it, the absolute read
          // below is idempotent. Any other mismatch refuses in preCommit
          // under the aux table's lock.)
          val vdelta = rows.filter(e.isNotNull)
            .groupBy((groupCols.map(col) :+ e.as(DvCol)): _*)
            .agg(sum(col("_sgn")).cast("long").as(CntCol))
            .filter(col(CntCol) =!= 0)
          aux.mergeInto(vdelta,
            whenMatchedSet = Map(CntCol -> (col(CntCol) + col(s"src_$CntCol"))),
            // a value whose live count reaches zero leaves the distinct set
            whenMatchedDelete = Some(col(CntCol) + col(s"src_$CntCol") === 0),
            insertWhenNotMatched = true,
            // a pure retraction of an unknown value (inconsistent feed)
            // must not insert a negative count
            insertWhenNotMatchedCond = Some(col(s"src_$CntCol") > 0),
            extraMeta = Map(AppliedSeqKey -> toSeq.toString),
            preCommit = Some(() => {
              val cur = appliedSeq(aux)
              if (cur != Some(fromSeq)) throw new IllegalStateException(
                s"stale aux maintenance window ($fromSeq, $toSeq] for " +
                  s"COUNT DISTINCT '$m': the aux watermark is " +
                  s"${cur.getOrElse("absent")}")
            }))
          ()
        }
        m -> aux.readUser()
          .join(p0.select(groupCols.map(col): _*), groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as(s"_abs_$m"))
      }.toMap
      val delta: DataFrame =
        if (extNames.isEmpty && dNames.isEmpty)
          // pure COUNT/SUM: no state read, no dirtiness — the original path
          p0.filter(sumsMoved)
        else {
        // join the CURRENT stored extremes of ONLY the delta's groups —
        // the aggregate is keyed by the group columns, so the state read
        // point-prunes through the table's own key indexes instead of
        // scanning O(group count) state per epoch. Fall back to the full
        // scan on a wide delta (at that width the scan is
        // delta-proportional anyway); NULL group keys were refused above,
        // so the point read can never miss a stored group.
        val keyed = KeyGen.withRecordKey(
          p0.select(groupCols.map(col): _*), groupCols)
        val keys = keyed
          .select(Meta.RecordKey).distinct().limit(StateKeyCap + 1)
          .collect().map(_.getString(0)).toSeq
        val stateBase =
          if (keys.nonEmpty && keys.size <= StateKeyCap)
            agg.readKeys(keys).drop(Meta.RecordKey, Meta.CommitSeq)
          else agg.readUser()
        val state = stateBase.select(
          groupCols.map(col) ++ extNames.map(m => col(m).as(s"_cur_$m")) ++
            dNames.map(m => col(m).as(s"_curd_$m")): _*)
        val d1 = p0.join(state, groupCols, "left")
        val withFinal: DataFrame =
          if (extNames.isEmpty) d1
          else {
            val dirtyCond = (
              minNames.map(m => col(s"_ret_$m") <= col(s"_cur_$m")) ++
              maxNames.map(m => col(s"_ret_$m") >= col(s"_cur_$m")))
              .map(c => coalesce(c, lit(false))).reduce(_ || _)
            val d1d = d1.withColumn("_dirty", dirtyCond)
            val dirtyGroups = d1d.filter(col("_dirty"))
              .select(groupCols.map(col): _*)
            // the dirty-group recompute scans the source ONCE, restricted
            // by the semi join — and is skipped outright when nothing
            // retracted an extreme (the probe re-joins the cached delta
            // with the small pruned state — no change-feed re-scan)
            val anyDirty = dirtyGroups.limit(1).count() > 0
            val d2 =
              if (!anyDirty) extNames.foldLeft(d1d)((d, m) =>
                d.withColumn(s"_rec_$m", lit(null)))
              else {
                val recAggs = minNames.map(m => min(extExpr(m)).as(s"_rec_$m")) ++
                  maxNames.map(m => max(extExpr(m)).as(s"_rec_$m"))
                val recBase0 = src.readAsOf(toSeq)
                val recBase = where.fold(recBase0)(w => recBase0.filter(expr(w)))
                val rec = recBase
                  .join(dirtyGroups, groupCols, "left_semi")
                  .groupBy(groupCols.map(col): _*)
                  .agg(recAggs.head, recAggs.tail: _*)
                d1d.join(rec, groupCols, "left")
              }
            // least/greatest skip NULLs: a new group takes the add
            // candidate, a no-adds group keeps the stored value
            (minNames.map(m =>
              m -> when(col("_dirty"), col(s"_rec_$m"))
                .otherwise(least(col(s"_cur_$m"), col(s"_add_$m")))) ++
              maxNames.map(m =>
                m -> when(col("_dirty"), col(s"_rec_$m"))
                  .otherwise(greatest(col(s"_cur_$m"), col(s"_add_$m")))))
              .foldLeft(d2) { case (d, (m, c)) => d.withColumn(m, c) }
          }
        // distinct counts land as ABSOLUTE values from the aux state; a
        // touched group with no live aux rows counts 0 distinct values
        val withD = dNames.foldLeft(withFinal)((d, m) =>
          d.join(dabs(m), groupCols, "left")
            .withColumn(m, coalesce(col(s"_abs_$m"), lit(0L))))
        val extMoved = extNames.map(m => !(col(m) <=> col(s"_cur_$m")))
          .reduceOption(_ || _).getOrElse(lit(false))
        val dMoved = dNames.map(m => !(col(m) <=> col(s"_curd_$m")))
          .reduceOption(_ || _).getOrElse(lit(false))
        withD.filter(sumsMoved || extMoved || dMoved)
          .select((groupCols :+ "n").map(col) ++
            sumNames.map(col) ++ extNames.map(col) ++ dNames.map(col): _*)
      }
      agg.mergeInto(delta,
      // an all-NULL sum contribution (e.g. one new row with a NULL
      // measure) arrives as a NULL delta — it must PRESERVE the stored
      // value, never null it out (and a NULL stored value stays NULL
      // rather than becoming 0)
      whenMatchedSet = (sumNames.map(m =>
        m -> when(col(s"src_$m").isNull, col(m))
          .otherwise(coalesce(col(m), lit(0)) + col(s"src_$m"))) ++
        // extremes and distinct counts arrive as ABSOLUTE values
        extNames.map(m => m -> col(s"src_$m")) ++
        dNames.map(m => m -> col(s"src_$m")) :+
        ("n" -> (col("n") + col("src_n")))).toMap,
      whenMatchedDelete = Some(col("n") + col("src_n") === 0),
      insertWhenNotMatched = true,
      extraMeta = extraMeta + (AppliedSeqKey -> toSeq.toString),
      // exactly-once under concurrent maintainers: validated under the
      // AGGREGATE's table lock, so a racing refresh that already applied
      // a newer (or this) window refuses instead of double-counting
      preCommit = Some(() => {
        val cur = appliedSeq(agg)
        if (cur != Some(fromSeq)) throw new IllegalStateException(
          s"stale maintenance window ($fromSeq, $toSeq]: the aggregate's " +
            s"applied watermark is ${cur.getOrElse("absent")} — " +
            "bootstrap first / re-read the watermark (concurrent refresh?)")
      }))
      ()
    } finally release()
  }
}
