package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraftTable
import graft.util.PinSet

/** Incremental DUPLICATED-SPAN census — the per-document
  * (n_shingles, n_dup, dup_ratio) table of [[Dedup.duplicatedSpanStats]]
  * (the Lee-et-al copied-span signal a crawl pipeline filters on)
  * maintained from the corpus table's change feed instead of recomputed
  * corpus-wide per crawl drop. The last of the three corpus-quadratic
  * curation steps to go incremental (after near-dup clustering and
  * segment dedup — round-16 verdict #1).
  *
  * Reference frame: the same incremental-pull discipline as the
  * reference pipeline (/root/reference/src/lambdas/launch_hudi/
  * handler.py:88-93 — `hudi_delta` consumes only files newer than the
  * last checkpoint), applied to the shingle document-frequency
  * aggregate, which is corpus-wide by definition.
  *
  * STATE — three keyed [[GraftTable]]s under one root (the
  * [[IncrementalSegmentDedup]] df/posting/output scaffolding with word
  * n-gram shingles in place of fixed segments):
  *  - `df/`   (key `sh` = md5 of the shingle): `(sh, df)` — how many
  *    documents carry the shingle (shingles are DISTINCT per doc, so
  *    df is a true document frequency).
  *  - `post/` (key `(sh, id)`): the inverted posting `(sh, id, one)`.
  *    A shingle CROSSING the df=2 boundary retroactively changes OTHER
  *    documents' census (doc A's span becomes "duplicated" the moment
  *    doc B arrives with the same n-gram); the posting names exactly
  *    those documents.
  *  - `out/`  (key `id`): the user-facing census
  *    `(id, n_shingles, n_dup, dup_ratio)` — bit-identical to the batch
  *    operator (minRatio 0) over the live corpus after every wave.
  *
  * PER-WAVE COST (the 100-TB contract): shingling touches ONLY the
  * wave's changed documents (before/after texts ride the change feed).
  * Unlike segment dedup, boundary-crossing partners need NO text at
  * all: a partner's shingle set is unchanged, so its census moves by
  * pure arithmetic — n_dup += (its shingles crossing up) − (crossing
  * down), both counted straight off the posting — and its stored out
  * row point-reads through the key index. Nothing re-reads the corpus.
  *
  * CRASH SAFETY: the [[IncrementalSegmentDedup]] contract verbatim —
  * commits land out → post → df, each with its own [[AppliedSeqKey]]
  * watermark and stale-window `preCommit` refusal; all wave frames
  * derive from the PRE-wave df state, so partial replay is
  * deterministic, and [[refresh]] heals a torn crash window (df behind
  * out) before advancing.
  */
object IncrementalSpanCensus {

  val AppliedSeqKey = "isc_applied_seq"
  val SrcRootKey = "isc_src_root"
  val IdColKey = "isc_id_col"
  val TextColKey = "isc_text_col"
  val NgramKey = "isc_ngram"

  /** Same driver-collect bound as [[IncrementalDedup.FetchKeyCap]]. */
  val FetchKeyCap = 10000

  /** Same per-key range/point-read fan-in bound as
    * [[IncrementalSegmentDedup.RangeReadCap]]: above it, one scan. */
  private[graft] val RangeReadCap = 256

  /** The three state tables of one census root. */
  case class State(df: GraftTable, post: GraftTable, out: GraftTable)

  def open(spark: SparkSession, location: String): State =
    State(GraftTable.open(spark, s"$location/df"),
      GraftTable.open(spark, s"$location/post"),
      GraftTable.open(spark, s"$location/out"))

  // df/post are MERGE_ON_READ (the [[IvmAux]] rationale: md5-scattered
  // keys make a COW merge rewrite the whole table per KB-scale wave);
  // out stays COW — it is the user-facing point-read table
  private def newState(spark: SparkSession, location: String): State =
    State(
      new GraftTable(spark, s"$location/df", Seq("sh"),
        tableType = GraftTable.MergeOnRead,
        compactEvery = IvmAux.AuxCompactEvery,
        clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes),
      new GraftTable(spark, s"$location/post", Seq("sh", "id"),
        tableType = GraftTable.MergeOnRead,
        compactEvery = IvmAux.AuxCompactEvery,
        clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes),
      new GraftTable(spark, s"$location/out", Seq("id"),
        clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes))

  /** The production state layout of [[create]] without the bootstrap —
    * for harnesses (Bench, IvmSoak) that bootstrap at an explicit seq. */
  private[graft] def stateAt(spark: SparkSession, location: String): State =
    newState(spark, location)

  def appliedSeq(t: GraftTable): Option[Long] =
    t.historyNewestFirst()
      .flatMap(_.extra.get(AppliedSeqKey)).map(_.toLong).nextOption()

  private[graft] def specOf(st: State): Option[Map[String, String]] =
    st.out.historyNewestFirst().find(_.extra.contains(SrcRootKey)).map(_.extra)

  /** The maintained per-document census — [[Dedup.duplicatedSpanStats]]'
    * exact output contract (minRatio 0) over the live corpus. */
  def output(st: State): DataFrame =
    st.out.readUser().select(col("id"), col("n_shingles"), col("n_dup"),
      col("dup_ratio"))

  private def requireValidIds(df: DataFrame, where: String): Unit =
    if (df.filter(col("id").isNull || col("id") < 0).limit(1).count() > 0)
      throw new IllegalStateException(
        s"null or negative document id in $where: the span-census state " +
          "is keyed by a non-negative LONG id (the posting range encoding) " +
          "— filter or remap ids first")

  /** Distinct (sh, id) shingle-hash postings of one document set. */
  private def postsOf(docs: DataFrame, n: Int): DataFrame =
    Dedup.shingles(docs, "id", "_t", n)
      .select(md5(col("s")).as("sh"), col("id"))

  /** The census rows of `posts` (one (sh, id) row per distinct doc
    * shingle) against the per-hash frequencies in `lookup` (sh, _df). */
  private def censusOf(posts: DataFrame, lookup: DataFrame): DataFrame =
    posts.join(lookup, Seq("sh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("_df") >= 2, 1)).as("n_dup"))
      .withColumn("dup_ratio",
        round(col("n_dup").cast("double") / col("n_shingles"), 4))

  /** One-time full build at the source snapshot `atSeq` —
    * [[IncrementalSegmentDedup.bootstrap]]'s aux discipline: df/post
    * overwrite any partial prior attempt, `out` commits LAST. */
  def bootstrap(src: GraftTable, st: State, idCol: String, textCol: String,
      n: Int, atSeq: Long,
      extraMeta: Map[String, String] = Map.empty): Unit = {
    val pins = new PinSet(s"${st.out.root}/_graft/stage-pins")
    try {
      val snap = pins.pin(src.readAsOf(atSeq)
        .select(col(idCol).cast("long").as("id"), col(textCol).as("_t")))
      requireValidIds(snap, "the bootstrap snapshot")
      val posts = pins.pin(postsOf(snap, n).withColumn("one", lit(1L)))
      val dfq = posts.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val meta = Map(AppliedSeqKey -> atSeq.toString)
      def land(t: GraftTable, rows: DataFrame): Unit = {
        if (t.history().isEmpty) t.bulkInsert(rows, extraMeta = meta)
        else {
          // a MOR aux table re-bootstrapping over applied waves may hold
          // delta logs; the overwrite requires a compacted snapshot
          if (t.latestCommit().exists(_.logFiles.nonEmpty)) t.compact()
          t.insertOverwriteTable(rows, extraMeta = meta)
        }
        ()
      }
      land(st.df, dfq)
      land(st.post, posts.select(col("sh"), col("id"), col("one")))
      val out = censusOf(posts.select(col("sh"), col("id")),
        dfq.select(col("sh"), col("df").as("_df")))
      st.out.bulkInsert(out, extraMeta = extraMeta ++ meta)
      ()
    } finally pins.release()
  }

  /** Create a SELF-DESCRIBING span-census state under `location`,
    * bootstrapped at the source's head, spec in the out table's
    * bootstrap commit, registered for hands-free `viewMaintain`
    * freshness — the [[IncrementalSegmentDedup.create]] lifecycle. */
  def create(spark: SparkSession, src: GraftTable, location: String,
      idCol: String, textCol: String, n: Int = 3): State = {
    require(idCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      textCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"id/text column names must be plain identifiers: $idCol, $textCol")
    require(n >= 1, s"shingle size must be >= 1: $n")
    val st = newState(spark, location)
    require(st.out.history().isEmpty,
      s"$location/out already holds a committed table — create needs a fresh location")
    val at = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    bootstrap(src, st, idCol, textCol, n, at,
      extraMeta = Map(SrcRootKey -> src.root, IdColKey -> idCol,
        TextColKey -> textCol, NgramKey -> n.toString))
    src.registerDependentView(st.out.root)
    st
  }

  /** Catch a [[create]]d state up to its source's head from nothing but
    * the spec in the out table's timeline; heals a torn crash window
    * (df behind out) first — see [[IncrementalSegmentDedup.refresh]].
    * Returns (fromSeq, toSeq). */
  def refresh(spark: SparkSession, st: State): (Long, Long) = {
    val spec = specOf(st).getOrElse(throw new IllegalStateException(
      s"no $SrcRootKey spec in the out table's timeline — not a created " +
        "span-census state"))
    val src = GraftTable.open(spark, spec(SrcRootKey))
    def run(f: Long, t: Long): Unit =
      maintain(src, st, spec(IdColKey), spec(TextColKey),
        spec(NgramKey).toInt, f, t,
        extraMeta = spec.filter { case (k, _) =>
          Seq(SrcRootKey, IdColKey, TextColKey, NgramKey).contains(k) })
    val outSeq = appliedSeq(st.out).get
    val dfSeq = appliedSeq(st.df).get
    if (dfSeq != outSeq) run(dfSeq, outSeq)
    val from = outSeq
    val to = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    if (to < from) throw new IllegalStateException(
      s"source head $to is BELOW the state's applied watermark $from — " +
        "the source was rolled back or restored past the state; " +
        "re-bootstrap against the restored corpus")
    if (to > from) run(from, to)
    (from, to)
  }

  /** [[refresh]] addressed by the OUT table's root — the registered
    * dependent-view entry point. */
  def refreshAt(spark: SparkSession, outRoot: String): (Long, Long) = {
    require(outRoot.endsWith("/out"),
      s"not a span-census out table root: $outRoot")
    refresh(spark, open(spark, outRoot.stripSuffix("/out")))
  }

  private def collectUnder(keys: DataFrame, col0: String): Option[Seq[Any]] = {
    val c = keys.select(col(col0)).distinct().limit(FetchKeyCap + 1)
      .collect().map(_.get(0)).toSeq
    if (c.size <= FetchKeyCap) Some(c) else None
  }

  /** Stored df rows for the given shingle hashes: key point reads under
    * the cap, one text-free state scan above it. */
  private def storedDf(st: State, hashes: DataFrame): DataFrame =
    collectUnder(hashes, "sh") match {
      case Some(ks) if ks.isEmpty =>
        st.df.readUser().limit(0).select(col("sh"), col("df"))
      case Some(ks) =>
        st.df.readKeys(ks.map(_.toString)).select(col("sh"), col("df"))
      case None =>
        st.df.readUser().join(hashes.select(col("sh")).distinct(), Seq("sh"),
          "left_semi").select(col("sh"), col("df"))
    }

  /** The posting rows of the given (crossing) hashes: per-hash
    * composite-key range reads under [[RangeReadCap]], one posting scan
    * above it (the bounded-fan-in rule of
    * [[IncrementalSegmentDedup.RangeReadCap]]). */
  private def postingsOf(st: State, hashes: DataFrame): DataFrame =
    collectUnder(hashes, "sh") match {
      case Some(ks) if ks.isEmpty =>
        st.post.readUser().limit(0).select(col("sh"), col("id"))
      case Some(ks) if ks.size <= RangeReadCap =>
        // grouped multi-range read (one scan, not one leg per hash);
        // the isin residual keeps the result exact
        st.post.readKeyRanges(ks.map(h =>
            (s"sh:$h,id:0000000000000000000", s"sh:$h,id:9999999999999999999")))
          .filter(col("sh").isin(ks.map(_.toString): _*))
          .select(col("sh"), col("id"))
      case _ =>
        st.post.readUser().join(hashes.select(col("sh")).distinct(), Seq("sh"),
          "left_semi").select(col("sh"), col("id"))
    }

  /** Stored out rows for the given document ids: key point reads under
    * the cap, one out-table scan above it. */
  private def storedOut(st: State, ids: DataFrame): DataFrame =
    collectUnder(ids, "id") match {
      case Some(ks) if ks.isEmpty =>
        st.out.readUser().limit(0)
          .select(col("id"), col("n_shingles"), col("n_dup"))
      case Some(ks) =>
        st.out.readKeys(ks.map(_.asInstanceOf[Long]))
          .select(col("id"), col("n_shingles"), col("n_dup"))
      case None =>
        st.out.readUser().join(ids.select(col("id")).distinct(), Seq("id"),
          "left_semi").select(col("id"), col("n_shingles"), col("n_dup"))
    }

  // ------------------------------------------------- driver wave path
  //
  // The wave's graph bookkeeping — df delta, boundary crossings, partner
  // arithmetic, posting delta, census of the changed docs — is pure
  // arithmetic over wave-proportional (sh, id) postings, yet the
  // distributed plans paid ~10 wave-sized AQE exchanges per wave plus
  // three locked merges whose SOURCE plans were unions of joins: the same
  // fixed replan/scheduling cost class [[IncrementalDedup.WaveSlices]]
  // removed from the dedup wave. Under [[IncrementalDedup.DriverWaveCap]]
  // the postings collect (narrow rows — one md5 + one long), the algebra
  // runs in Scala, the state lookups stay the SAME pruned reads
  // (readKeys point reads / per-hash ranges, scan fallback), and the
  // three merge deltas land as LocalRelations with exact stats so each
  // commit's write job is trivial. Over the cap (or at cap 0, the test
  // pin) the distributed plans run unchanged.

  /** Driver-side stored-out lookup (partner census rows): point reads
    * under the cap — the same key-index path the plan-shape spec pins —
    * isin-filtered scan above it. */
  private def storedOutLocal(st: State,
      ids: Seq[Long]): Map[Long, (Long, Long)] = {
    if (ids.isEmpty) return Map.empty
    val rows =
      if (ids.size <= FetchKeyCap) st.out.readKeys(ids)
      else st.out.readUser().filter(col("id").isin(ids.map(Long.box): _*))
    rows.select(col("id"), col("n_shingles"), col("n_dup")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** The three merge deltas assembled driver-side from a collected wave
    * — the same algebra as the distributed frames, value-identical by
    * construction (the ratio rounding stays a Spark expression over the
    * LocalRelation so it is bit-equal to the distributed plan). None
    * when the crossing-posting collect overruns the cap. */
  private def localDeltas(spark0: SparkSession, st: State, w: IvmAux.Wave,
      fromSeq: Long, toSeq: Long,
      cap: Int): Option[(DataFrame, DataFrame, DataFrame)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val moved = IvmAux.movedLocal(st.df, w, FetchKeyCap,
      s"negative shingle df in window ($fromSeq, $toSeq] — the df state " +
        "does not match this source history; re-bootstrap")
    graft.util.StageTimer.mark("df_delta")
    val crossing: Map[String, Long] = moved.collect {
      case (sh, (o, nw)) if (o >= 2) != (nw >= 2) =>
        sh -> (if (nw >= 2) 1L else -1L)
    }
    val posts = IvmAux.postingsLocal(st.post, crossing.keys.toSeq.sorted,
      RangeReadCap, cap).getOrElse(return None)
    val partnerShift: Map[Long, Long] = posts.iterator
      .filter { case (_, id) => !w.changed(id) }
      .foldLeft(Map.empty[Long, Long]) { case (m, (sh, id)) =>
        m.updated(id, m.getOrElse(id, 0L) + crossing(sh))
      }.filter(_._2 != 0L)
    val partnerStored = storedOutLocal(st, partnerShift.keys.toSeq.sorted)
    graft.util.StageTimer.mark("partner_arith")
    // census of the changed docs against the POST-wave df: every hash a
    // changed doc carries is in the wave's delta, so moved covers it
    val outChanged = w.a.groupBy(_._2).iterator.map { case (id, rows) =>
      Row(id, rows.length.toLong,
        rows.count { case (sh, _) => moved(sh)._2 >= 2 }.toLong)
    }
    // partnerStored misses an id only on a torn replay (out already at
    // toSeq — its merge is skipped below), so dropping it is safe
    val partnerRows = partnerShift.iterator.flatMap { case (id, s) =>
      partnerStored.get(id).map { case (n, nd) => Row(id, n, nd + s) }
    }
    val aIds = w.a.iterator.map(_._2).toSet
    val delRows = (w.delIds ++ w.afterIds.filterNot(aIds)).iterator
      .map(id => Row(id, -1L, -1L))
    val outDelta = spark0.createDataFrame(
      (outChanged ++ partnerRows ++ delRows).toSeq.asJava,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("n_shingles", LongType, nullable = false),
        StructField("n_dup", LongType, nullable = false))))
      .withColumn("dup_ratio",
        when(col("n_shingles") >= 0L,
          round(col("n_dup").cast("double") / col("n_shingles"), 4))
          .otherwise(lit(null).cast("double")))
    Some((outDelta, IvmAux.postDeltaLocal(spark0, w),
      IvmAux.dfDeltaLocal(spark0, moved)))
  }

  /** Apply the source's `(fromSeq, toSeq]` change feed — see the object
    * doc for the algebra, cost and crash contract. */
  def maintain(src: GraftTable, st: State, idCol: String, textCol: String,
      n: Int, fromSeq: Long, toSeq: Long,
      extraMeta: Map[String, String] = Map.empty): Unit = {
    // partial-replay admission: commits land out → post → df, so the
    // only legal states are (f,f,f) (t,f,f) (t,t,f) (t,t,t)
    val seqs = Seq(st.out, st.post, st.df).map(t =>
      appliedSeq(t).getOrElse(throw new IllegalStateException(
        s"state table ${t.root} carries no $AppliedSeqKey watermark — bootstrap first")))
    seqs.foreach(s => if (s != fromSeq && s != toSeq)
      throw new IllegalStateException(
        s"state watermarks $seqs do not admit window ($fromSeq, $toSeq] — " +
          "re-read the watermark (concurrent refresh?)"))
    require(seqs.sliding(2).forall(p => p.head >= p.last),
      s"torn state order (out, post, df) = $seqs: commits land out-first; " +
        "this root was written by something else — re-bootstrap")
    if (seqs.forall(_ == toSeq)) return
    val pins = new PinSet(s"${st.out.root}/_graft/stage-pins")
    try {
      val img = pins.pin(src.changesDiffImages(fromSeq, toSeq))
      val before = img.filter(col("op").isin("D", "U"))
        .select(col("_before")(idCol).cast("long").as("id"),
          col("_before")(textCol).as("_t"))
      val after = pins.pin(img.filter(col("op").isin("I", "U"))
        .select(col("_after")(idCol).cast("long").as("id"),
          col("_after")(textCol).as("_t")))
      requireValidIds(after, s"the ($fromSeq, $toSeq] change feed")
      val distB = pins.pin(postsOf(before, n))
      val distA = pins.pin(postsOf(after, n))
      val spark0 = img.sparkSession
      val waveCap = spark0.conf.getOption(IncrementalDedup.DriverWaveCapKey)
        .map(_.toInt).getOrElse(IncrementalDedup.DriverWaveCap)
      // ONE capped collection of the wave's postings feeds the whole
      // driver path (see the driver-wave-path note above); None — over
      // the cap, or cap 0 — runs the distributed plans below unchanged
      val wave: Option[IvmAux.Wave] = if (waveCap > 0)
        IvmAux.collectWave(img, after, distB, distA, idCol, waveCap) else None
      graft.util.StageTimer.mark("feed_shingles")
      val (outDelta, postDelta, dfDelta) = wave
        .flatMap(w => localDeltas(spark0, st, w, fromSeq, toSeq, waveCap))
        .getOrElse {
        // ---------------- distributed fallback (the pre-cap plans) ----
        // signed df delta per shingle hash, joined with the PRE-wave df
        val delta = pins.pin(
          distA.groupBy(col("sh")).agg(count(lit(1)).as("_add"))
            .join(distB.groupBy(col("sh")).agg(count(lit(1)).as("_rem")),
              Seq("sh"), "full_outer")
            .select(col("sh"),
              (coalesce(col("_add"), lit(0L)) - coalesce(col("_rem"), lit(0L)))
                .as("_d")))
        val moved = pins.pin(delta
          .join(storedDf(st, delta), Seq("sh"), "left")
          .select(col("sh"), coalesce(col("df"), lit(0L)).as("_old"),
            (coalesce(col("df"), lit(0L)) + col("_d")).as("_new")))
        if (moved.filter(col("_new") < 0).limit(1).count() > 0)
          throw new IllegalStateException(
            s"negative shingle df in window ($fromSeq, $toSeq] — the df state " +
              "does not match this source history; re-bootstrap")
        // boundary crossings, with DIRECTION: +1 when the hash becomes
        // duplicated, −1 when it stops being duplicated
        val crossing = pins.pin(moved
          .filter((col("_old") >= 2) =!= (col("_new") >= 2))
          .select(col("sh"),
            when(col("_new") >= 2, lit(1L)).otherwise(lit(-1L)).as("_dir")))
        graft.util.StageTimer.mark("df_delta")
        val changedIds = img.select(
          coalesce(col("_after")(idCol), col("_before")(idCol))
            .cast("long").as("id")).distinct()
        // UNCHANGED partner docs move by PURE ARITHMETIC: their shingle
        // sets didn't change, so n_shingles holds and n_dup shifts by the
        // signed crossing count over their postings — no text, no
        // re-shingling, one point-read of their stored census rows
        val partnerShift = pins.pin(postingsOf(st, crossing.select(col("sh")))
          .join(crossing, Seq("sh"))
          .join(changedIds, Seq("id"), "left_anti")
          .groupBy(col("id")).agg(sum(col("_dir")).as("_shift"))
          .filter(col("_shift") =!= 0L))
        graft.util.StageTimer.mark("partner_arith")
        val partnerRows = storedOut(st, partnerShift.select(col("id")))
          .join(partnerShift, Seq("id"))
          .select(col("id"), col("n_shingles"),
            (col("n_dup") + col("_shift")).as("n_dup"))
          .withColumn("dup_ratio",
            round(col("n_dup").cast("double") / col("n_shingles"), 4))
        // changed docs recompute from their after-image shingles against
        // the POST-wave df (stored values overridden by the wave's moves)
        val rHashes = distA.select(col("sh")).distinct()
        val lookup = storedDf(st, rHashes)
          .join(moved, Seq("sh"), "full_outer")
          .select(col("sh"), coalesce(col("_new"), col("df")).as("_df"))
        val outRows = censusOf(distA, lookup)
        // retract: deleted docs, and changed docs whose new text yields no
        // shingles (null / shorter than n words) — the batch census has no
        // row for a shingle-less doc
        val delRows = img.filter(col("op") === "D")
          .select(col("_before")(idCol).cast("long").as("id"))
          .unionByName(after.select(col("id"))
            .join(distA.select(col("id")).distinct(), Seq("id"), "left_anti"))
          .select(col("id"), lit(-1L).as("n_shingles"), lit(-1L).as("n_dup"),
            lit(null).cast("double").as("dup_ratio"))
        // posting delta: pairs leaving / entering the corpus
        val postDel = distB.join(distA, Seq("sh", "id"), "left_anti")
          .withColumn("one", lit(0L))
        val postAdd = distA.join(distB, Seq("sh", "id"), "left_anti")
          .withColumn("one", lit(1L))
        (outRows.unionByName(partnerRows).unionByName(delRows),
          postDel.unionByName(postAdd),
          moved.filter(col("_new") =!= col("_old"))
            .select(col("sh"), col("_new").as("df")))
      }

      def guard(t: GraftTable): Option[() => Unit] = Some(() => {
        val cur = appliedSeq(t)
        if (cur != Some(fromSeq)) throw new IllegalStateException(
          s"stale maintenance window ($fromSeq, $toSeq] at ${t.root}: " +
            s"applied watermark is ${cur.getOrElse("absent")} — " +
            "re-read the watermark (concurrent refresh?)")
      })
      val meta = extraMeta + (AppliedSeqKey -> toSeq.toString)
      IvmAux.dumpPlan("span out delta", outDelta)
      IvmAux.dumpPlan("span post delta", postDelta)
      IvmAux.dumpPlan("span df delta", dfDelta)
      if (appliedSeq(st.out).contains(fromSeq))
        st.out.mergeInto(outDelta,
          whenMatchedSet = Seq("n_shingles", "n_dup", "dup_ratio")
            .map(c => c -> col(s"src_$c")).toMap,
          whenMatchedDelete = Some(col("src_n_shingles") === -1L),
          insertWhenNotMatched = true,
          insertWhenNotMatchedCond = Some(col("src_n_shingles") >= 0L),
          extraMeta = meta, preCommit = guard(st.out))
      graft.util.StageTimer.mark("merge_out")
      if (appliedSeq(st.post).contains(fromSeq))
        IvmAux.commitAux(st.post, postDelta, col("one") === 0L,
          whenMatchedSet = Map("one" -> col("src_one")),
          delSrc = col("src_one") === 0L, insSrc = col("src_one") === 1L,
          toSeq = toSeq, extraMeta = Map(AppliedSeqKey -> toSeq.toString),
          guard = guard(st.post))
      graft.util.StageTimer.mark("merge_post")
      if (appliedSeq(st.df).contains(fromSeq))
        IvmAux.commitAux(st.df, dfDelta, col("df") === 0L,
          whenMatchedSet = Map("df" -> col("src_df")),
          delSrc = col("src_df") === 0L, insSrc = col("src_df") > 0L,
          toSeq = toSeq, extraMeta = Map(AppliedSeqKey -> toSeq.toString),
          guard = guard(st.df))
      graft.util.StageTimer.mark("merge_df")
      ()
    } finally pins.release()
  }
}
