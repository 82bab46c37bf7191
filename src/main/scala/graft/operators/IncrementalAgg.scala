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
    maxs: Map[String, Column] = Map.empty) {
  def names: Seq[String] =
    (sums.keys ++ mins.keys ++ maxs.keys).toSeq.sorted
  require(names.distinct.size == names.size && !names.contains("n"),
    s"measure names must be distinct and not 'n': $names")
  // the underscore prefix is the maintenance plan's internal namespace
  // (_sgn, _dirty, _add_/_ret_/_cur_/_rec_<m>) — refuse at construction
  // instead of failing with an ambiguous-column analysis error mid-run
  require(names.forall(!_.startsWith("_")),
    s"measure names may not start with '_' (reserved): $names")
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
    val snap0 = src.readAsOf(atSeq).drop(Meta.RecordKey, Meta.CommitSeq)
    val snap = where.fold(snap0)(w => snap0.filter(expr(w)))
    val aggs = meas.names.map { m =>
      meas.sums.get(m).map(e => sum(e).as(m))
        .orElse(meas.mins.get(m).map(e => min(e).as(m)))
        .getOrElse(max(meas.maxs(m)).as(m))
    }
    val full = snap.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      requireNoNullGroups(full, groupCols, "the bootstrap snapshot")
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
    val agg = new GraftTable(spark, location, groupCols)
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
    val sumNames = meas.sums.keys.toSeq.sorted
    val minNames = meas.mins.keys.toSeq.sorted
    val maxNames = meas.maxs.keys.toSeq.sorted
    val extNames = minNames ++ maxNames
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
    val rows = where.fold(rows0)(w => rows0.filter(expr(w)))
    val added = col("_sgn") > 0
    val delta0 = rows.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_sgn")).as("n"),
        sumNames.map(m => sum(meas.sums(m) * col("_sgn")).as(m)) ++
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
    val release: () => Unit = () => { p0.unpersist(blocking = false); () }
    try {
      requireNoNullGroups(p0, groupCols, s"the ($fromSeq, $toSeq] change feed")
      val delta: DataFrame =
        if (extNames.isEmpty)
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
          groupCols.map(col) ++ extNames.map(m => col(m).as(s"_cur_$m")): _*)
        val dirtyCond = (
          minNames.map(m => col(s"_ret_$m") <= col(s"_cur_$m")) ++
          maxNames.map(m => col(s"_ret_$m") >= col(s"_cur_$m")))
          .map(c => coalesce(c, lit(false))).reduce(_ || _)
        val d1 = p0.join(state, groupCols, "left")
          .withColumn("_dirty", dirtyCond)
        val dirtyGroups = d1.filter(col("_dirty")).select(groupCols.map(col): _*)
        // the dirty-group recompute scans the source ONCE, restricted by
        // the semi join — and is skipped outright when nothing retracted
        // an extreme (the probe re-joins the cached delta with the small
        // pruned state — no change-feed re-scan)
        val anyDirty = dirtyGroups.limit(1).count() > 0
        val d2 =
          if (!anyDirty) extNames.foldLeft(d1)((d, m) =>
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
            d1.join(rec, groupCols, "left")
          }
        // least/greatest skip NULLs: a new group takes the add candidate,
        // a no-adds group keeps the stored value
        val withFinal = (minNames.map(m =>
          m -> when(col("_dirty"), col(s"_rec_$m"))
            .otherwise(least(col(s"_cur_$m"), col(s"_add_$m")))) ++
          maxNames.map(m =>
            m -> when(col("_dirty"), col(s"_rec_$m"))
              .otherwise(greatest(col(s"_cur_$m"), col(s"_add_$m")))))
          .foldLeft(d2) { case (d, (m, c)) => d.withColumn(m, c) }
        val extMoved = extNames.map(m => !(col(m) <=> col(s"_cur_$m")))
          .reduce(_ || _)
        withFinal.filter(sumsMoved || extMoved)
          .select((groupCols :+ "n").map(col) ++
            sumNames.map(col) ++ extNames.map(col): _*)
      }
      agg.mergeInto(delta,
      // an all-NULL sum contribution (e.g. one new row with a NULL
      // measure) arrives as a NULL delta — it must PRESERVE the stored
      // value, never null it out (and a NULL stored value stays NULL
      // rather than becoming 0)
      whenMatchedSet = (sumNames.map(m =>
        m -> when(col(s"src_$m").isNull, col(m))
          .otherwise(coalesce(col(m), lit(0)) + col(s"src_$m"))) ++
        // extremes arrive as ABSOLUTE new values, not deltas
        extNames.map(m => m -> col(s"src_$m")) :+
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
