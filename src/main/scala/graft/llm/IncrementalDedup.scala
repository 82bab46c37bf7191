package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Meta
import graft.operators.GraftTable

/** Incremental corpus deduplication — the MinHash near-dup CLUSTER state
  * of a growing document corpus, maintained from the corpus table's
  * change feed instead of recomputed corpus-wide per crawl drop.
  *
  * Reference frame: the reference pipeline's incremental pulls feed each
  * CDC batch forward without reprocessing history
  * (/root/reference/src/lambdas/launch_hudi/handler.py:99-116 — the
  * `hudi_delta` step consumes only new files); this operator applies the
  * same discipline to near-dup clustering, the one curation step that is
  * naively corpus-quadratic. A 100 TB corpus receiving a 100 GB crawl
  * drop must not re-shingle 100 TB.
  *
  * STATE: a keyed [[GraftTable]] (key = the document id, which must be a
  * non-negative LONG) holding one row per live document:
  * `(id, thash, sig, n_sh, comp)` — the md5 text hash, the 64-perm
  * minhash signature, the distinct-shingle count, and the near-dup
  * component label (min member id, [[Dedup.minhashComponents]]'
  * contract). The state is self-describing: the bootstrap commit records
  * the source root, column names and LSH parameters, so [[refresh]]
  * needs nothing but the state table — the same lifecycle contract as
  * [[graft.operators.IncrementalAgg]], including the crash-safe
  * [[AppliedSeqKey]] watermark committed atomically with each
  * application and the stale-window `preCommit` refusal under the table
  * lock.
  *
  * PER-WAVE COST (the 100-TB contract): text-proportional work — the
  * shuffle of raw text, shingling, signature hashing, exact-Jaccard
  * verification — touches ONLY (a) the wave's changed documents and
  * (b) the point-fetched texts of candidate partners and
  * split-component survivor representatives (bounded by true match
  * volume, read through the corpus table's key index). The banding
  * census — density-cap pricing and candidate-partner naming — rides a
  * PERSISTED BAND STORE (`_graft/bands`, keyed `(bk, rid)`, one row per
  * bucket × live-thash rep) whose key layout manifest-prunes each
  * wave's read to the buckets the wave's own documents touch, so the
  * round-18 store-wide re-banding pass is gone; the remaining
  * state-table scans are narrow filters with no shuffle.
  *
  * EXACTNESS: after any sequence of insert/update/delete waves, the
  * maintained components equal `Dedup.minhashComponents(liveCorpus)` on
  * the final snapshot, under two documented provisos:
  *  - identical text is recognized via md5 (the [[Dedup.exactStats]]
  *    convention) rather than byte comparison;
  *  - the `maxBandFreq` density cap is priced against the CURRENT
  *    corpus at each wave, while a fresh batch run prices it against
  *    the FINAL corpus — a bucket crossing the cap between waves can
  *    leave the incremental state with edges (found while the bucket
  *    was sparse) that the batch run would suppress, i.e. incremental
  *    recall ≥ batch recall. The cap is an explicit approximation
  *    contract already ([[Dedup.minhashPairs]]); at the default 1024 it
  *    never binds on sane corpora.
  *
  * Maintenance algebra per wave (change feed images from
  * [[GraftTable.changesDiffImages]]):
  *  - an INSERT adds a document; an UPDATE is retract(before) +
  *    add(after); a DELETE retracts.
  *  - added docs glue to identical-text groups by thash (jaccard 1 ≥
  *    threshold — no verification needed), and DISTINCT-new-text reps
  *    run the batch candidate algebra against the live rep store:
  *    same-signature candidates bypass the cap (the batch
  *    within-signature contract), band-bucket candidates respect it,
  *    and every candidate is exact-Jaccard verified against
  *    point-fetched partner texts after the stored-shingle-count size
  *    bound prunes it.
  *  - a retraction can only SPLIT its own component (edges are
  *    pairwise text properties — removal never connects anything), so
  *    components that lost a member recompute their survivor edges
  *    locally: identical-survivor star edges come straight from the
  *    state's thash groups, and only the per-thash representative
  *    texts are fetched for the rep-level [[Dedup.minhashPairs]] rerun.
  *  - components touched only by ADDITION keep their membership star
  *    (comp → member from the state) so new edges merge them without
  *    re-verifying their interior.
  *  - connected components over (stars ∪ glue ∪ verified) relabel
  *    exactly the affected membership; rows whose label didn't move
  *    are not rewritten (the merge is delta-proportional).
  */
object IncrementalDedup {

  /** Applied-source-commit watermark key (commit `extra`), same contract
    * as [[graft.operators.IncrementalAgg.AppliedSeqKey]]. */
  val AppliedSeqKey = "idd_applied_seq"

  /** Self-describing state spec keys, recorded by [[create]] and
    * re-stamped by every [[refresh]]. */
  val SrcRootKey = "idd_src_root"
  val IdColKey = "idd_id_col"
  val TextColKey = "idd_text_col"

  /** LSH parameters as `threshold,bands,rows,maxBandFreq`. */
  val ParamsKey = "idd_params"

  /** Point-fetch collects at most this many partner/survivor-rep ids to
    * the driver (→ [[GraftTable.readKeys]] pruned read); a wider fetch
    * set falls back to a snapshot semi join. */
  val FetchKeyCap = 10000

  /** Per-bucket range-read fan-in bound for the BAND STORE (same rule as
    * [[IncrementalSpanCensus.RangeReadCap]]): at most this many per-bk
    * range-read legs; a wider wave falls back to one band-store scan. */
  private[graft] val RangeReadCap = 256

  /** A wave's component graph at most this many edges runs a DRIVER
    * union-find instead of the log-rounds distributed CC (≈20 iteration
    * jobs to label a graph that fits in a few MB); above it, the
    * distributed loop. Overridable per session via
    * [[DriverCcEdgeCapKey]] (tests force the fallback with 0). */
  val DriverCcEdgeCap = 200000
  val DriverCcEdgeCapKey = "graft.ivm.driverCcEdgeCap"

  /** Wave frames at most this many rows take the DRIVER wave paths
    * ([[driverComponents]]' cap discipline applied to the band store's
    * per-wave delta and to the merge-delta assembly): the distributed
    * plans are ~10 wave-sized shuffle stages each, whose AQE replan +
    * scheduling fixed cost dominated the stage (band delta measured
    * 2.4–3.1 s/wave at sf0.1 with < 30k delta rows); under the cap the
    * same algebra runs over collected wave-proportional slices —
    * isin-filtered state scans, per-thash mins in Scala, ONE narrow
    * hashing job — so per-wave cost is collect-bound. Above the cap (or
    * 0, which tests use to pin the fallback) the distributed plans run
    * unchanged. */
  val DriverWaveCap = 50000
  val DriverWaveCapKey = "graft.ivm.driverWaveCap"

  /** Min-label connected components on the driver — the exact
    * [[Dedup.connectedComponents]] contract (every vertex of `pairs`
    * appears; label = the component's minimum member id; a vertex with
    * only self-loops labels itself). */
  private[graft] def driverComponents(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    // roots unioned toward the smaller id, so find() IS the min label
    parent.keys.map(v => v -> find(v)).toMap
  }

  private val StateCols = Seq("id", "thash", "sig", "n_sh", "comp")

  /** The batch signature contract: 64 permutations always (the stored
    * sig must be bit-identical to [[Dedup.minhashSignatures]]' default,
    * whatever the banding). */
  private val Perms = 64

  case class Params(threshold: Double = 0.5, bands: Int = 16, rows: Int = 4,
      maxBandFreq: Int = 1024) {
    require(threshold <= 1.0,
      s"star edges assume identical text passes the threshold (got $threshold)")
    require(bands * rows <= Perms,
      s"bands*rows must be <= $Perms (got ${bands * rows})")
    def encoded: String = s"$threshold,$bands,$rows,$maxBandFreq"
  }
  private def decodeParams(s: String): Params = {
    val p = s.split(",")
    Params(p(0).toDouble, p(1).toInt, p(2).toInt, p(3).toInt)
  }

  def appliedSeq(state: GraftTable): Option[Long] =
    state.historyNewestFirst()
      .flatMap(_.extra.get(AppliedSeqKey)).map(_.toLong).nextOption()

  /** The state rows of one document set: id (LONG, refused if null or
    * negative), md5 text hash, 64-perm minhash signature (empty array
    * for a shingle-less doc) and distinct-shingle count. */
  private[graft] def signaturesOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("_t"))
    val sh = Dedup.shingles(base, "id", "_t")
    val agg = Dedup.minhashSignatures(sh, "id")
      .join(sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh")), Seq("id"))
    base.select(col("id"), md5(coalesce(col("_t"), lit(""))).as("thash"))
      .join(agg, Seq("id"), "left")
      .select(col("id"), col("thash"),
        coalesce(col("sig"), array().cast("array<bigint>")).as("sig"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"))
  }

  private def requireValidIds(df: DataFrame, where: String): Unit =
    if (df.filter(col("id").isNull || col("id") < 0).limit(1).count() > 0)
      throw new IllegalStateException(
        s"null or negative document id in $where: the dedup state is keyed " +
          "by a non-negative LONG id (the point-fetch path's ordered key " +
          "encoding) — filter or remap ids first")

  // ------------------------------------------------------- band store
  //
  // The one corpus-proportional wave term used to be the banding census:
  // pricing the density cap (and naming candidate partners) re-banded
  // the WHOLE rep signature store every wave (IvmSoak round 18: maintain
  // grew 1.8× at 10× corpus from exactly this pass). The fix is the same
  // move that made the span census's partners text-free: PERSIST the
  // banding as its own keyed state table — one row per (band bucket,
  // live-thash-group rep) keyed `(bk, rid)` — laid out in key order, so
  // a wave's census manifest-prunes to the buckets its own documents
  // touch (per-bk range reads, [[RangeReadCap]] fan-in bound, scan
  // fallback). The store lives INSIDE the state root (`_graft/bands`):
  // it dies with the table on DROP, is invisible to the main table's
  // fsck/clean (they enumerate `data/` only), and is a pure DERIVED
  // index — absent or stale (cloned state, pre-upgrade state, torn
  // crash window) it is transparently REBUILT from the main store at
  // the wave's start (one banding pass, the old per-wave cost, once).
  //
  // Commit order: bands FIRST, then the main state (both carry the
  // AppliedSeqKey watermark). The census reads the POST-merge band rows
  // minus the wave's own new ids, which makes a torn replay (bands at
  // `to`, main at `from`) read the exact same frames. Rep-endpoint
  // substitution inside an identical-text group (a stored rep handed
  // off to a smaller new id this wave) is component-safe: both
  // endpoints carry identical text, and the glue edge already joins
  // them, so verification and the final labels are unchanged.

  private[graft] def bandsRootOf(state: GraftTable): String =
    s"${state.root}/_graft/bands"

  /** How many band-store delta commits between compactions — the
    * amortization knob for the store's one corpus-proportional write. */
  private val BandsCompactEvery = 8

  private def bandsTable(spark: SparkSession, state: GraftTable): GraftTable =
    new GraftTable(spark, bandsRootOf(state), Seq("bk", "rid"),
      targetFileBytes = state.targetFileBytes, // adopt the owner's sizing
      // MERGE_ON_READ, deliberately: a wave's add/delete keys scatter
      // uniformly over the bucket-hash key space, so a COW merge admits
      // (and rewrites) nearly every base file — a corpus-proportional
      // write per wave, the very term this store exists to kill
      // (measured: the bands stage at 4–9 s/wave on the sf0.1 fixture).
      // MOR appends one wave-sized delta log instead; reads merge the
      // log per admitted file group, and every BandsCompactEvery'th
      // commit folds the logs — corpus-proportional work paid 1/N'th
      // per wave instead of 1× per wave.
      tableType = GraftTable.MergeOnRead,
      compactEvery = BandsCompactEvery,
      clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes)

  /** (sum of admitted files across the wave's per-bucket range-read
    * legs, band-store file total) of the most recent [[bandsRead]] that
    * took the pruned path — the plan-shape observability hook. */
  @volatile private[graft] var lastBandsRead: Option[(Int, Int)] = None

  /** Signature identity for density counting and same-sig candidates:
    * md5 over the exact permutation values — collision-safe at any
    * corpus scale (128-bit), unlike a 64-bit rehash. */
  private def sidCol: org.apache.spark.sql.Column =
    md5(expr("array_join(transform(sig, x -> cast(x as string)), ',')"))

  /** Band rows of per-thash rep rows `(id, thash, sig, n_sh)` — one row
    * per (bucket, rep): `(bk, rid, thash, sid, n_sh)`. `bk` is a
    * fixed-width sortable string (band index + unsigned bucket hash) so
    * the `(bk, rid)` record-key layout range-prunes by bucket.
    * JOIN-FREE: the bucket hashes ([[Dedup.bandBucketArray]] — the same
    * expression [[Dedup.minhashBandBuckets]] explodes, so store rows and
    * rebuild rows are bit-equal) and the carried rep columns come out of
    * ONE generator projection; the old explode-then-join-back-on-rid
    * shape cost a shuffle per call site, three times per wave. */
  private def bandRowsOf(reps: DataFrame, p: Params): DataFrame =
    reps.select(col("id").as("rid"), col("thash"), sidCol.as("sid"),
        col("n_sh"), posexplode(Dedup.bandBucketArray(p.bands, p.rows)))
      .select(format_string("%02d-%016x", col("pos"), col("col")).as("bk"),
        col("rid"), col("thash"), col("sid"), col("n_sh"))

  /** Per-thash group reps (min id) of a signature frame. */
  private def repsOf(sigs: DataFrame): DataFrame = {
    val m = sigs.filter(col("n_sh") >= 1)
      .groupBy(col("thash")).agg(min(col("id")).as("_rpid"))
    sigs.join(m, Seq("thash")).filter(col("id") === col("_rpid"))
      .select(col("id"), col("thash"), col("sig"), col("n_sh"))
  }

  /** Full rebuild of the band store from the main state at watermark
    * `atSeq` — bootstrap, upgrade of a pre-band state, healed clone. */
  private def rebuildBands(bands: GraftTable, state: GraftTable,
      p: Params, atSeq: Long): Unit = {
    val rows = bandRowsOf(repsOf(state.readUser()
      .select(col("id"), col("thash"), col("sig"), col("n_sh"))), p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      rows.count() // size the file plan off real bytes (stats-balloon rule)
      if (bands.history().isEmpty)
        bands.bulkInsert(rows, extraMeta = Map(AppliedSeqKey -> atSeq.toString))
      else bands.insertOverwriteTable(rows,
        extraMeta = Map(AppliedSeqKey -> atSeq.toString))
      ()
    } finally { rows.unpersist(blocking = false); () }
  }

  /** The band-store rows of the given buckets: per-bk key-range reads
    * under [[RangeReadCap]], one store scan above it. */
  private def bandsRead(bands: GraftTable, buckets: DataFrame): DataFrame = {
    val cols = Seq("bk", "rid", "thash", "sid", "n_sh").map(col)
    val ks = buckets.select(col("bk")).distinct().limit(RangeReadCap + 1)
      .collect().map(_.getString(0)).toSeq
    if (ks.isEmpty) bands.readUser().limit(0).select(cols: _*)
    else if (ks.size <= RangeReadCap) {
      // grouped multi-range read: the per-bucket legs paid one scan plan
      // + one job each (≤256/wave); the union-of-ranges admission is
      // identical and the isin residual keeps the census exact
      val f = bands.readKeyRanges(ks.map(b =>
        (s"bk:$b,rid:0000000000000000000", s"bk:$b,rid:9999999999999999999")))
      lastBandsRead = bands.lastRangeRead
      f.filter(col("bk").isin(ks: _*)).select(cols: _*)
    } else bands.readUser()
      .join(buckets.select(col("bk")).distinct(), Seq("bk"), "left_semi")
      .select(cols: _*)
  }

  /** A wave's driver-collected slices (the [[DriverWaveCap]] gate):
    * every row the per-wave GRAPH bookkeeping needs, wave-proportional
    * by the delta algebra's own contract. The state reads are `isin`
    * FILTERS on the columnar scan — no join, no exchange. Derived
    * facts (per-thash mins, glue edges, wave reps) are lazy one-pass
    * Scala, shared by the band delta, the glue edges and the wave-rep
    * frame so none of them re-runs a shuffle stage. */
  private[llm] final case class WaveSlices(
      newAll: Array[WaveSlices.R], removedIds: Set[Long],
      remSh: Array[WaveSlices.R], stAffSh: Array[WaveSlices.R]) {
    lazy val newSh: Array[WaveSlices.R] = newAll.filter(_.nSh >= 1)
    /** live OLD members' min id per affected thash (the liveMin frame) */
    lazy val liveMinMap: Map[String, Long] =
      stAffSh.iterator.filter(r => !r.rm && !r.re).toSeq
        .groupBy(_.thash).map { case (t, rs) => t -> rs.map(_.id).min }
    /** min new id per new thash (the newThash frame) */
    lazy val newMinMap: Map[String, Long] =
      newSh.toSeq.groupBy(_.thash).map { case (t, rs) => t -> rs.map(_.id).min }
    /** one rep row per NEW thash (the newRepsAll frame) */
    lazy val newReps: Array[WaveSlices.R] =
      newSh.filter(n => newMinMap(n.thash) == n.id)
    /** exact-text glue edges: old-rep→new (jaccard 1, no verification)
      * plus new-rep→new-member stars (glueOld ∪ glueNew) */
    lazy val glueEdges: Seq[(Long, Long)] =
      newSh.iterator.flatMap(n =>
        liveMinMap.get(n.thash).map(l => (l, n.id))).toSeq ++
        newSh.iterator.filter(n => newMinMap(n.thash) != n.id)
          .map(n => (newMinMap(n.thash), n.id)).toSeq
  }
  private[llm] object WaveSlices {
    final case class R(id: Long, thash: String, sig: Seq[Long], nSh: Long,
        isNew: Boolean, rm: Boolean, re: Boolean)
  }

  /** Collect the wave's slices under `cap` rows each; None (fall back to
    * the distributed plans) when any slice exceeds it. */
  private def collectWaveSlices(st: DataFrame, newSigs: DataFrame,
      removed: DataFrame, cap: Int): Option[WaveSlices] = {
    import org.apache.spark.sql.{Row => SRow}
    def ofRow(r: SRow, isNew: Boolean, rm: Boolean, re: Boolean): WaveSlices.R =
      WaveSlices.R(r.getLong(0), r.getString(1), r.getSeq[Long](2),
        r.getLong(3), isNew, rm, re)
    val stateCols = Seq(col("id"), col("thash"), col("sig"), col("n_sh"))
    val newRows = newSigs.select(stateCols: _*).limit(cap + 1).collect()
    if (newRows.length > cap) return None
    val removedIds = removed.limit(cap + 1).collect().map(_.getLong(0)).toSet
    if (removedIds.size > cap) return None
    val newIds = newRows.iterator.map(_.getLong(0)).toSet
    val newAll = newRows.map(ofRow(_, isNew = true, rm = false, re = true))
    // retracted state rows: one isin-filtered columnar scan, no join
    val remSh: Array[WaveSlices.R] =
      if (removedIds.isEmpty) Array.empty
      else st.filter(col("id").isin(removedIds.toSeq.map(Long.box): _*))
        .filter(col("n_sh") >= 1).select(stateCols: _*).collect()
        .map(r => ofRow(r, isNew = false, rm = true, re = newIds(r.getLong(0))))
    val thashAff = (newAll.iterator.filter(_.nSh >= 1).map(_.thash) ++
      remSh.iterator.map(_.thash)).toSet
    if (thashAff.size > cap) return None
    // the affected state slice: again a filter on the scan, no join
    val stAffSh: Array[WaveSlices.R] =
      if (thashAff.isEmpty) Array.empty
      else {
        val rows = st.filter(col("thash").isin(thashAff.toSeq: _*))
          .filter(col("n_sh") >= 1).select(stateCols: _*)
          .limit(cap + 1).collect()
        if (rows.length > cap) return None
        rows.map(r => ofRow(r, isNew = false,
          rm = removedIds(r.getLong(0)), re = newIds(r.getLong(0))))
      }
    Some(WaveSlices(newAll, removedIds, remSh, stAffSh))
  }

  private val WaveRowSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("thash",
      org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("sig",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType), nullable = true),
    org.apache.spark.sql.types.StructField("n_sh",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** LocalRelation of wave rows in the (id, thash, sig, n_sh) contract. */
  private def localRowsDf(spark0: SparkSession,
      rows: Array[WaveSlices.R]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark0.createDataFrame(rows.map(x =>
      org.apache.spark.sql.Row(x.id, x.thash, x.sig, x.nSh)).toSeq.asJava,
      WaveRowSchema)
  }

  /** LocalRelation of (ia, ib) edge pairs. */
  private def localPairsDf(spark0: SparkSession,
      pairs: Seq[(Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark0.createDataFrame(pairs.map(e =>
      org.apache.spark.sql.Row(e._1, e._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ia",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ib",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The wave's band-store delta computed DRIVER-SIDE from the collected
    * [[WaveSlices]]: the same per-thash algebra as the distributed
    * fallback — pre-wave stored rep P(T), post-wave rep R'(T) = min(live
    * old members, new members), adds where the rep changed, deletes for
    * removed/superseded reps, add-wins fold per (bk, rid) — with the
    * grouping and mins in Scala, and the only cluster work ONE narrow
    * [[bandRowsOf]] job over a LocalRelation so the xxhash64 / md5
    * bucket identities stay bit-equal to the store's.
    *
    * Exactness note (same as the distributed plan): deletes for band
    * rows that never existed (non-rep retracted members) are harmless
    * tombstones for absent keys. */
  private def driverBandDelta(spark0: SparkSession, w: WaveSlices,
      p: Params): DataFrame = {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val u = w.stAffSh ++ w.newSh
    val adds = Array.newBuilder[WaveSlices.R]
    val dels = Array.newBuilder[WaveSlices.R]
    u.groupBy(_.thash).foreach { case (_, rows) =>
      val pOpt = rows.filter(!_.isNew).minByOption(_.id)
      val rOpt = rows.filter(r => r.isNew || (!r.rm && !r.re)).minByOption(_.id)
      val pidAlive = pOpt.filter(!_.rm)
      rOpt.foreach { rr =>
        if (!pidAlive.exists(_.id == rr.id)) adds += rr
        pidAlive.foreach(pp => if (pp.id != rr.id) dels += pp)
      }
    }
    dels ++= w.remSh
    // one narrow hashing job; same expressions as every other store row
    val banded = bandRowsOf(localRowsDf(spark0, adds.result()), p)
      .withColumn("_add", lit(true))
      .unionByName(bandRowsOf(localRowsDf(spark0, dels.result()), p)
        .withColumn("_add", lit(false)))
      .collect()
    // add-wins fold per (bk, rid)
    val best = scala.collection.mutable.Map.empty[(String, Long), SRow]
    banded.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      if (r.getBoolean(5) || !best.contains(k)) {
        if (!best.get(k).exists(_.getBoolean(5))) best(k) = r
      }
    }
    val outSchema = StructType(Seq(
      StructField("bk", StringType, nullable = true),
      StructField("rid", LongType, nullable = false),
      StructField("thash", StringType, nullable = true),
      StructField("sid", StringType, nullable = true),
      StructField("n_sh", LongType, nullable = false),
      StructField(Meta.Deleted, BooleanType, nullable = false)))
    val out = best.valuesIterator.map { r =>
      if (r.getBoolean(5))
        SRow(r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getLong(4), false)
      else SRow(r.getString(0), r.getLong(1), null, null, -1L, true)
    }.toSeq
    spark0.createDataFrame(out.asJava, outSchema)
  }

  /** One-time full clustering of the source snapshot at `atSeq` into the
    * (empty) state table — [[Dedup.minhashComponents]] for the labels,
    * one signature row per document (singletons label themselves). */
  def bootstrap(src: GraftTable, state: GraftTable, idCol: String,
      textCol: String, p: Params, atSeq: Long,
      extraMeta: Map[String, String] = Map.empty): Unit = {
    require(state.keyFields == Seq("id"),
      s"the dedup state table must be keyed by 'id' (got ${state.keyFields.mkString(",")})")
    val snap = src.readAsOf(atSeq)
      .select(col(idCol), col(textCol))
    val sigs = signaturesOf(snap, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      requireValidIds(sigs, "the bootstrap snapshot")
      val comps = Dedup.minhashComponents(
        snap.select(col(idCol).cast("long").as(idCol), col(textCol)),
        idCol, textCol, p.threshold, p.bands, p.rows, p.maxBandFreq)
        .withColumnRenamed("comp", "_c")
      val out = sigs.join(comps, Seq("id"), "left")
        .select(col("id"), col("thash"), col("sig"), col("n_sh"),
          coalesce(col("_c"), col("id")).as("comp"))
        // materialized BEFORE the bulk insert so the file plan sizes off
        // the relation's ACTUAL bytes: Catalyst's size-only estimate for
        // the components join is a near-product of the sides, and the
        // ballooned estimate wrote ONE FILE PER ROW (a 5,000-doc state
        // bootstrapped as 5,000 files — every later wave then paid
        // 5,000 file opens per state scan and the inline fold rewrote
        // them all). The IncrementalJoin.bootstrap stats-balloon fix,
        // applied to the signature store.
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        out.count()
        state.bulkInsert(out,
          extraMeta = extraMeta + (AppliedSeqKey -> atSeq.toString))
        // band store: the derived (bk, rid) census index, built at
        // bootstrap so the very first wave already range-prunes
        rebuildBands(bandsTable(out.sparkSession, state), state, p, atSeq)
        ()
      } finally { out.unpersist(blocking = false); () }
    } finally { sigs.unpersist(blocking = false); () }
  }

  /** Create a SELF-DESCRIBING dedup state at `location`, bootstrapped at
    * the source's head, spec recorded in the bootstrap commit — the
    * [[graft.operators.IncrementalAgg.create]] lifecycle. */
  /** The production state layout of [[create]] without the bootstrap —
    * for harnesses (Bench, IvmSoak) that bootstrap at an explicit seq.
    * MERGE_ON_READ (round 21): a wave's %-scattered ids admit nearly
    * every base file, so the locked COW merge paid a corpus-proportional
    * rewrite per wave (the 1.3–2.5 s/wave floor of three rounds of
    * PERF_NOTES); MOR appends the wave-sized delta as ONE tombstone log
    * and the every-8th inline compaction folds it — the band store's own
    * commit shape, applied to the main state. */
  private[graft] def stateAt(spark: SparkSession, location: String): GraftTable =
    new GraftTable(spark, location, Seq("id"),
      tableType = GraftTable.MergeOnRead,
      compactEvery = IvmAux.AuxCompactEvery,
      clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes)

  def create(spark: SparkSession, src: GraftTable, location: String,
      idCol: String, textCol: String, p: Params = Params()): GraftTable = {
    require(idCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      textCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"id/text column names must be plain identifiers: $idCol, $textCol")
    val state = stateAt(spark, location)
    require(state.history().isEmpty,
      s"$location already holds a committed table — create needs a fresh location")
    val at = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    bootstrap(src, state, idCol, textCol, p, at,
      extraMeta = Map(SrcRootKey -> src.root, IdColKey -> idCol,
        TextColKey -> textCol, ParamsKey -> p.encoded))
    // table→view registration: a `viewMaintain` corpus table keeps the
    // dedup state fresh hands-free after each of its commits
    src.registerDependentView(state.root)
    state
  }

  private[graft] def specOf(state: GraftTable): Option[Map[String, String]] =
    state.historyNewestFirst().find(_.extra.contains(SrcRootKey)).map(_.extra)

  /** Catch a [[create]]d state up to its source's head from nothing but
    * the spec in its own timeline; re-stamps the spec (archive-proof).
    * Returns (fromSeq, toSeq) applied. */
  def refresh(spark: SparkSession, state: GraftTable): (Long, Long) = {
    val spec = specOf(state).getOrElse(throw new IllegalStateException(
      s"no $SrcRootKey spec in the state's timeline — not a created dedup state"))
    val src = GraftTable.open(spark, spec(SrcRootKey))
    val from = appliedSeq(state).get
    val to = maintainLatest(src, state, spec(IdColKey), spec(TextColKey),
      decodeParams(spec(ParamsKey)),
      extraMeta = Map(SrcRootKey -> spec(SrcRootKey),
        IdColKey -> spec(IdColKey), TextColKey -> spec(TextColKey),
        ParamsKey -> spec(ParamsKey)))
    (from, to)
  }

  /** Catch up to the source head — idempotent; refuses a rolled-back
    * source loudly (the state reflects commits that no longer exist). */
  def maintainLatest(src: GraftTable, state: GraftTable, idCol: String,
      textCol: String, p: Params,
      extraMeta: Map[String, String] = Map.empty): Long = {
    val from = appliedSeq(state).getOrElse(throw new IllegalStateException(
      s"state table carries no $AppliedSeqKey watermark — bootstrap first"))
    val to = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    if (to < from) throw new IllegalStateException(
      s"source head $to is BELOW the state's applied watermark $from — " +
        "the source was rolled back or restored past the state; " +
        "re-bootstrap against the restored corpus")
    if (to > from) maintain(src, state, idCol, textCol, p, from, to, extraMeta)
    to
  }

  /** The near-dup clusters of the maintained state, in
    * [[Dedup.minhashComponents]]' output contract: (id, comp) for every
    * document whose component has ≥ 2 live members (exactly the
    * vertices the batch edge list touches — singletons don't appear). */
  def clusters(state: GraftTable): DataFrame = {
    val st = state.readUser().select(col("id"), col("comp"))
    val multi = st.groupBy(col("comp")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select(col("comp"))
    st.join(multi, Seq("comp"), "left_semi").select(col("id"), col("comp"))
  }

  /** Point-fetch the (id, text) rows of `ids` from the corpus at commit
    * `toSeq`: through [[GraftTable.readKeys]]' index-pruned path when
    * the head IS `toSeq` and the set is collectable, else a snapshot
    * semi join (correct for any historical window, no pruning). */
  private[llm] def fetchDocs(src: GraftTable, idCol: String, textCol: String,
      toSeq: Long, ids: DataFrame): DataFrame = {
    val atHead = src.latestCommit().exists(_.seq == toSeq)
    val collected: Option[Seq[Long]] =
      if (!atHead) None
      else {
        val c = ids.select(col("id")).distinct().limit(FetchKeyCap + 1)
          .collect().map(_.getLong(0)).toSeq
        if (c.size <= FetchKeyCap) Some(c) else None
      }
    val rows = collected match {
      case Some(keys) if keys.isEmpty =>
        return src.readAsOf(toSeq).select(col(idCol).cast("long").as("id"),
          col(textCol).as("_t")).limit(0)
      case Some(keys) => src.readKeys(keys)
      case None => src.readAsOf(toSeq)
        .join(ids.select(col("id").cast("string")
          .as("_fid")), col(idCol).cast("string") === col("_fid"), "left_semi")
    }
    rows.select(col(idCol).cast("long").as("id"), col(textCol).as("_t"))
  }

  /** Apply the source's `(fromSeq, toSeq]` change feed to the state —
    * see the object doc for the algebra and cost contract. Ranges
    * compose; `preCommit` under the state's lock makes concurrent
    * maintainers exactly-once. */
  def maintain(src: GraftTable, state: GraftTable, idCol: String,
      textCol: String, p: Params, fromSeq: Long, toSeq: Long,
      extraMeta: Map[String, String] = Map.empty): Unit = {
    require(state.keyFields == Seq("id"),
      s"the dedup state table must be keyed by 'id' (got ${state.keyFields.mkString(",")})")
    // every reused frame is pinned EAGERLY (never persist()): a
    // persisted frame keeps its full logical subtree, and this wave's
    // frames reference each other heavily (live → st ∪ newSigs ∪
    // removed; allReps → live; sized → allReps ×4; verified → sized +
    // fetched → sized → ...), so plan SIZE — not data — grows as the
    // product of the fan-outs: the analyzed tree reached millions of
    // nodes, minutes of driver-side planning and a multi-GB plan string
    // per wave (the round-16 OOM). The pin truncates each frame to a
    // leaf, making per-wave planning cost CONSTANT in pipeline depth.
    // Pins go through the shared PinSet: localCheckpoint by default, or
    // recoverable parquet stage pins under graft.ivm.reliablePins for
    // cluster runs; released after the merge lands either way.
    val pins = new graft.util.PinSet(s"${state.root}/_graft/stage-pins")
    def pin(df: DataFrame): DataFrame = pins.pin(df)
    val release: () => Unit = () => pins.release()
    val img = pin(src.changesDiffImages(fromSeq, toSeq))
    val newSigs = pin(signaturesOf(
      img.filter(col("op").isin("I", "U"))
        .select(col("_after")(idCol).as(idCol), col("_after")(textCol).as(textCol)),
      idCol, textCol))
    val removed = pin(img.filter(col("op").isin("D", "U"))
      .select(col("_before")(idCol).cast("long").as("id")))
    graft.util.StageTimer.mark("feed_sigs")
    try {
      requireValidIds(newSigs, s"the ($fromSeq, $toSeq] change feed")
      val spark0 = newSigs.sparkSession
      val waveCap = spark0.conf.getOption(DriverWaveCapKey)
        .map(_.toInt).getOrElse(DriverWaveCap)
      val st = state.readUser().select(StateCols.map(col): _*)
      // ONE driver-side slice collection shared by the band delta, the
      // glue edges and the wave-rep frame (None above the cap — every
      // consumer below falls back to its distributed plan)
      val slices: Option[WaveSlices] = if (waveCap > 0)
        collectWaveSlices(st, newSigs, removed, waveCap) else None
      val newIdSet = newSigs.select(col("id"))
      // live partners: current state minus retracted minus re-added (an
      // updated doc's OLD row must not glue/verify as a live partner).
      // LAZY like the other state restrictions: depth-2 over pinned
      // leaves, so its consumers (survivors / addMembers — themselves
      // pinned) re-scan the state columnar instead of paying a full
      // corpus-sized localCheckpoint materialization per wave — the last
      // corpus-proportional PIN of the wave after the band store killed
      // the census scan.
      val live = st.join(removed, Seq("id"), "left_anti")
        .join(newIdSet, Seq("id"), "left_anti")
      val hasSh = col("n_sh") >= 1
      // ---- affected-thash frames: state scans restricted (broadcast
      // semi join, no shuffle) to the wave's thash universe — glue
      // lookups and band-store rep handoffs both come from here, so the
      // old store-wide thash groupBy is gone. Deliberately LAZY, not
      // pinned: both are depth-2 over pinned leaves (st is a table read,
      // removed/newSigs are pins), so re-evaluation inside the merge
      // action costs a cheap columnar re-scan while a pin would cost an
      // extra eager full-computation job per wave.
      val stRemoved = st.join(removed, Seq("id"), "left_semi")
      val thashAff = newSigs.filter(hasSh).select(col("thash"))
        .unionByName(stRemoved.filter(hasSh).select(col("thash"))).distinct()
      val stAff = st.join(thashAff, Seq("thash"), "left_semi")
      // live OLD members' min id per affected thash — the old algebra's
      // liveThash, now wave-proportional
      val liveMin = stAff.join(removed, Seq("id"), "left_anti")
        .join(newIdSet, Seq("id"), "left_anti")
        .groupBy(col("thash")).agg(min(col("id")).as("_lid"))
      // ---- exact-text glue (jaccard 1, no verification)
      val glueOld = newSigs.filter(hasSh).join(liveMin, Seq("thash"))
        .select(col("_lid").as("ia"), col("id").as("ib"))
      val newThash = newSigs.filter(hasSh)
        .groupBy(col("thash")).agg(min(col("id")).as("_nrid"))
      val glueNew = newSigs.filter(hasSh).join(newThash, Seq("thash"))
        .filter(col("id") =!= col("_nrid"))
        .select(col("_nrid").as("ia"), col("id").as("ib"))
      // ---- band-store maintenance (commits FIRST — see the band-store
      // note above; the census then reads post-wave rows)
      val bands = bandsTable(spark0, state)
      if (!appliedSeq(bands).exists(s => s == fromSeq || s == toSeq))
        rebuildBands(bands, state, p, fromSeq) // absent / pre-band / cloned
      // wave reps: one per NEW thash (glue groups and new-text groups)
      val newRepsAll = slices match {
        case Some(w) => localRowsDf(spark0, w.newReps)
        case None => pin(newSigs.filter(hasSh).join(newThash, Seq("thash"))
          .filter(col("id") === col("_nrid"))
          .select(col("id"), col("thash"), col("sig"), col("n_sh")))
      }
      graft.util.StageTimer.mark("bands_prep")
      // tombstone UPSERT, not mergeInto: a merge resolves matched-vs-
      // insert at WRITE time, which reads the admitted base groups —
      // and a wave's keys scatter over the whole bucket space, so that
      // read was corpus-proportional. The MOR upsert just appends the
      // wave-sized delta log (deletes ride tombstones, latest-wins by
      // the monotonic toSeq ordering resolves at read), and the every-
      // BandsCompactEvery'th compaction folds the logs.
      def commitBands(delta: DataFrame): Unit = {
        bands.upsert(delta.withColumn(Meta.Ordering, lit(f"$toSeq%020d")),
          extraMeta = Map(AppliedSeqKey -> toSeq.toString),
          preCommit = Some(() => {
            val cur = appliedSeq(bands)
            if (cur != Some(fromSeq)) throw new IllegalStateException(
              s"stale band-store window ($fromSeq, $toSeq]: the band " +
                s"store's watermark is ${cur.getOrElse("absent")} — " +
                "re-read the watermark (concurrent refresh?)")
          }))
        ()
      }
      if (appliedSeq(bands).contains(fromSeq)) {
        val localDelta = slices.map(w => driverBandDelta(spark0, w, p))
        localDelta match {
          case Some(delta) =>
            graft.util.StageTimer.mark("bands_delta")
            // a LocalRelation carries exact stats — no balloon, no persist
            commitBands(delta)
          case None => distributedBandDelta()
        }
        ()
      } // else: torn replay — bands already at toSeq; the rows are identical
      // Over-cap fallback: the same algebra as [[driverBandDelta]],
      // declared distributed. P(T) = pre-wave stored rep; R'(T) =
      // post-wave rep = min(live old members, new members). Emit adds
      // where the rep changed (or the group is new) and deletes for
      // removed/superseded reps; untouched groups see zero band-store
      // churn. ONE flagged per-thash aggregate computes both rep rows
      // (conditional MINs over the same row universe: state slice ∪
      // wave rows), one more folds add-wins per (bk, rid).
      def distributedBandDelta(): Unit = {
        val u = stAff.filter(hasSh)
          .join(removed.select(col("id"), lit(true).as("_rm")).distinct(),
            Seq("id"), "left")
          .join(newIdSet.select(col("id"), lit(true).as("_re")).distinct(),
            Seq("id"), "left")
          .select(col("id"), col("thash"), col("sig"), col("n_sh"),
            lit(false).as("_new"), coalesce(col("_rm"), lit(false)).as("_rm"),
            coalesce(col("_re"), lit(false)).as("_re"))
          .unionByName(newSigs.filter(hasSh).select(col("id"), col("thash"),
            col("sig"), col("n_sh"), lit(true).as("_new"),
            lit(false).as("_rm"), lit(true).as("_re")))
        // struct MIN orders by the leading id field, so each agg is the
        // argmin ROW — the rep's sig/n_sh ride along, no lookup join
        val g = u.groupBy(col("thash")).agg(
          min(when(!col("_new"),
            struct(col("id"), col("_rm"), col("sig"), col("n_sh")))).as("_p"),
          min(when(col("_new") || (!col("_rm") && !col("_re")),
            struct(col("id"), col("sig"), col("n_sh")))).as("_r"))
        val pidAlive = when(col("_p").isNotNull && !col("_p._rm"), col("_p.id"))
        val addReps = g.filter(col("_r").isNotNull &&
            (pidAlive.isNull || pidAlive =!= col("_r.id")))
          .select(col("_r.id").as("id"), col("thash"),
            col("_r.sig").as("sig"), col("_r.n_sh").as("n_sh"))
        val handoff = g.filter(col("_r").isNotNull && pidAlive.isNotNull &&
            col("_r.id") =!= pidAlive)
          .select(col("_p.id").as("id"), col("thash"),
            col("_p.sig").as("sig"), col("_p.n_sh").as("n_sh"))
        val addBand = bandRowsOf(addReps, p)
        val delCand = bandRowsOf(stRemoved.filter(hasSh), p)
          .unionByName(bandRowsOf(handoff, p))
        // add-wins per (bk, rid) in one aggregate (was: distinct + anti
        // join — two more shuffles); a delete that survives rides a
        // tombstone with the -1 shingle sentinel
        val folded = addBand.withColumn("_add", lit(true))
          .unionByName(delCand.withColumn("_add", lit(false)))
          .groupBy(col("bk"), col("rid"))
          .agg(max(struct(col("_add"), col("thash"), col("sid"),
            col("n_sh"))).as("_m"))
          .select(col("bk"), col("rid"),
            when(col("_m._add"), col("_m.thash")).as("thash"),
            when(col("_m._add"), col("_m.sid")).as("sid"),
            when(col("_m._add"), col("_m.n_sh")).otherwise(lit(-1L)).as("n_sh"),
            (!col("_m._add")).as(Meta.Deleted))
        // No caller-side persist+count: the stats balloon (the delta is
        // a union of joins whose size-only estimate once planned
        // thousands of log files) is caught at the write seam —
        // guardWritePlan materializes exactly when the estimate is both
        // file-count-insane and out of proportion to the MEASURED leaves
        // (pinned LogicalRDD leaves no longer vouch). An over-cap wave
        // thus pays one materialization, not two (round-20 advice).
        graft.util.StageTimer.mark("bands_delta")
        commitBands(folded)
      }
      graft.util.StageTimer.mark("bands")
      // ---- candidate algebra for DISTINCT new texts (batch parity:
      // candidates are generated between text representatives; a new
      // text already live needs no candidates — its rep's edges exist)
      val pairReps = slices match {
        case Some(w) =>
          // candidates only for thashes with NO live old members — a
          // local-set filter on the local rep frame, no anti join
          val liveT = w.liveMinMap.keySet.toSeq
          newRepsAll.filter(if (liveT.isEmpty) lit(true)
            else !col("thash").isin(liveT: _*))
            .select(col("id"), col("sig"), col("n_sh"), sidCol.as("sid"))
        case None => newRepsAll
          .join(liveMin.select(col("thash")), Seq("thash"), "left_anti")
          .select(col("id"), col("sig"), col("n_sh"), sidCol.as("sid"))
      }
      val bandedNewAll = pin(bandRowsOf(newRepsAll, p))
      val pairRepIds = pairReps.select(col("id").as("rid"))
      val newBuckets = bandedNewAll.join(pairRepIds, Seq("rid"), "left_semi")
        .select(col("bk")).distinct()
      // store partners in the wave's buckets: a PRUNED read of the band
      // store (post-merge = post-wave reps) minus the wave's own docs.
      // Rep-endpoint substitution inside an identical-text group is
      // component-exact (glue already joins the endpoints); density is
      // sid-based so substitution never changes a bucket's count.
      val storeRows = bandsRead(bands, newBuckets)
        .join(newIdSet.select(col("id").as("rid")), Seq("rid"), "left_anti")
      val poolNB = pin(storeRows.unionByName(bandedNewAll)
        .join(newBuckets, Seq("bk"), "left_semi"))
      // cap parity: bucket density is the DISTINCT-signature count in
      // the bucket (identical to the batch sigReps count), restricted to
      // the buckets the wave's new reps occupy — the only place
      // candidate pairs consult it
      val bCnt = poolNB.groupBy(col("bk"))
        .agg(countDistinct(col("sid")).as("_nb"))
      val admitted = poolNB.join(bCnt.filter(col("_nb") <= p.maxBandFreq),
        Seq("bk"))
      val bandedNewB = admitted.join(pairRepIds, Seq("rid"), "left_semi")
      val candBand = bandedNewB.as("x").join(admitted.as("y"),
          col("x.bk") === col("y.bk") && col("x.rid") =!= col("y.rid"))
        .select(least(col("x.rid"), col("y.rid")).as("ia"),
          greatest(col("x.rid"), col("y.rid")).as("ib"))
      // same-signature candidates bypass the cap (batch within-signature
      // contract). Identical signatures co-occupy EVERY bucket, so the
      // pool restricted to the new reps' own buckets already holds every
      // same-sig partner; sid is a 128-bit signature identity.
      val candSig = pairReps.select(col("id").as("_na"), col("sid"))
        .join(poolNB.select(col("rid").as("_ob"), col("sid")).distinct(),
          Seq("sid"))
        .filter(col("_na") =!= col("_ob"))
        .select(least(col("_na"), col("_ob")).as("ia"),
          greatest(col("_na"), col("_ob")).as("ib"))
      // exact size-bound prefilter on STORED shingle counts — candidates
      // that can never verify are dropped before any text is fetched
      val cnt = poolNB.select(col("rid").as("id"), col("n_sh")).distinct()
      val sized = pin(candBand.unionByName(candSig).distinct()
        .join(cnt.toDF("ia", "_na"), Seq("ia"))
        .join(cnt.toDF("ib", "_nb2"), Seq("ib"))
        .filter(least(col("_na"), col("_nb2")).cast("double") >=
          lit(p.threshold) * greatest(col("_na"), col("_nb2"))))
      graft.util.StageTimer.mark("candidates")
      // ---- split components: a retraction can only split its OWN
      // component — recompute survivor edges locally (star from stored
      // thash groups; only per-thash rep texts are fetched and re-paired)
      val splitComps = st.join(removed, Seq("id"), "left_semi")
        .select(col("comp")).distinct()
      val survivors = pin(live.join(splitComps, Seq("comp"), "left_semi"))
      val survThash = survivors.filter(hasSh)
        .groupBy(col("thash")).agg(min(col("id")).as("_srid"))
      val survStar = survivors.filter(hasSh).join(survThash, Seq("thash"))
        .filter(col("id") =!= col("_srid"))
        .select(col("_srid").as("ia"), col("id").as("ib"))
      val survRepIds = survThash.select(col("_srid").as("id"))
      // ---- one point-fetch for all old texts this wave needs
      val oldNeeded = sized
        .select(explode(array(col("ia"), col("ib"))).as("id")).distinct()
        .join(newIdSet, Seq("id"), "left_anti")
      val fetched = pin(fetchDocs(src, idCol, textCol, toSeq,
        oldNeeded.unionByName(survRepIds).distinct()))
      graft.util.StageTimer.mark("partner_fetch")
      // ---- exact-Jaccard verification of the sized candidates
      val newDocsT = img.filter(col("op").isin("I", "U"))
        .select(col("_after")(idCol).cast("long").as("id"),
          col("_after")(textCol).as("_t"))
      val vsh = Dedup.shingles(newDocsT.unionByName(fetched), "id", "_t")
      val verified = sized
        .join(vsh.select(col("id").as("ia"), col("s")), Seq("ia"))
        .join(vsh.select(col("id").as("ib"), col("s").as("_s2")), Seq("ib"))
        .filter(col("s") === col("_s2"))
        .groupBy(col("ia"), col("ib"), col("_na"), col("_nb2"))
        .agg(count(lit(1)).as("_i"))
        .filter(col("_i").cast("double") /
          (col("_na") + col("_nb2") - col("_i")) >= p.threshold)
        .select(col("ia"), col("ib"))
      // survivor rep-level re-pairing (the local batch rerun) — banded
      // from the STORED signatures (bit-identical to a recompute by the
      // state contract); only the exact-jaccard verification shingles
      // the fetched rep texts. The old full minhashPairs re-aggregated
      // a 64-perm signature for every survivor rep — the single most
      // expensive stage of a deletion wave (~1.8–2.4 s at sf0.1)
      val survRepDocs = fetched.join(survRepIds, Seq("id"), "left_semi")
      val survSigRows = survivors.filter(hasSh)
        .join(survRepIds, Seq("id"), "left_semi")
        .select(col("id"), col("sig"), col("n_sh"))
      val survPairs = Dedup.minhashPairsFromSigs(survSigRows, survRepDocs,
        "id", "_t", p.threshold, p.bands, p.rows, p.maxBandFreq)
        .select(col("ia"), col("ib"))
      // ---- components over the affected neighborhood only
      val glue = slices match {
        case Some(w) => localPairsDf(spark0, w.glueEdges)
        case None => pin(glueOld.unionByName(glueNew))
      }
      graft.util.StageTimer.mark("cc_glue")
      val verifiedP = pin(verified)
      graft.util.StageTimer.mark("cc_verified")
      val touchedOldIds = glue.select(col("ia").as("id"))
        .unionByName(verifiedP.select(explode(array(col("ia"), col("ib"))).as("id")))
        .distinct()
        .join(newIdSet, Seq("id"), "left_anti")
      val addComps = live.join(touchedOldIds, Seq("id"), "left_semi")
        .select(col("comp")).distinct()
        .join(splitComps, Seq("comp"), "left_anti")
      val addMembers = pin(live.join(addComps, Seq("comp"), "left_semi"))
      graft.util.StageTimer.mark("cc_members")
      val starOld = addMembers.filter(col("id") =!= col("comp"))
        .select(col("comp").as("ia"), col("id").as("ib"))
      // pinned BEFORE the cap probe: limit(cap+1).collect() evaluates the
      // whole edge plan, and an over-cap wave would otherwise recompute
      // the edge-building joins (notably survPairs' minhash-LSH pass)
      // inside the distributed fallback — exactly on the heavy waves the
      // cap exists to protect
      val edges = pin(glue.unionByName(verifiedP).unionByName(survStar)
        .unionByName(survPairs).unionByName(starOld))
      graft.util.StageTimer.mark("cc_edges")
      // components over the affected neighborhood — which is SMALL by
      // design (the whole point of the delta algebra), so the log-rounds
      // distributed CC pays ~20 iteration jobs to label a graph that
      // fits on the driver. Same capped-collect discipline as the key
      // fetches: under the cap, one collect + union-find (min-label,
      // identical contract); above it, the distributed loop. The wave
      // bench's verify_cc stage was ~6 s of pure iteration overhead.
      val ccCap = spark0.conf.getOption(DriverCcEdgeCapKey)
        .map(_.toInt).getOrElse(DriverCcEdgeCap)
      val collected = edges.limit(ccCap + 1).collect()
      val labels: Option[Map[Long, Long]] =
        if (collected.length <= ccCap)
          Some(driverComponents(collected.map(r => (r.getLong(0), r.getLong(1)))))
        else None
      graft.util.StageTimer.mark("verify_cc")
      // ---- delta-proportional merge: new rows, moved labels, deletes.
      // When the driver union-find labeled the wave, the merge delta is
      // ASSEMBLED driver-side too (same [[DriverWaveCap]] discipline):
      // every input is wave-proportional and pinned — newSigs, survivors,
      // addMembers, removed — so the assembly is a map lookup over
      // collected rows instead of six shuffle stages, and mergeInto
      // plans against a LocalRelation with exact stats.
      val deltaLocal: Option[Seq[org.apache.spark.sql.Row]] =
        if (waveCap <= 0) None
        else labels.flatMap { lab =>
          // explicit column order: the comp-keyed semi joins put the
          // join column first, so positional reads need the re-select
          val newA = newSigs.select(col("id"), col("thash"), col("sig"),
            col("n_sh")).limit(waveCap + 1).collect()
          val survA = survivors.select(StateCols.map(col): _*)
            .limit(waveCap + 1).collect()
          val membA = addMembers.select(StateCols.map(col): _*)
            .limit(waveCap + 1).collect()
          val remA = removed.limit(waveCap + 1).collect()
          if (Seq(newA, survA, membA, remA).exists(_.length > waveCap)) None
          else {
            val newIds2 = newA.iterator.map(_.getLong(0)).toSet
            def lbl(id: Long): Long = lab.getOrElse(id, id)
            val newL = newA.iterator.map(r => org.apache.spark.sql.Row(
              r.getLong(0), r.getString(1), r.getSeq[Long](2), r.getLong(3),
              lbl(r.getLong(0))))
            // survivors and addMembers are disjoint by construction
            // (addComps anti-joins splitComps); rows whose label did not
            // move are not rewritten — the delta-proportional contract
            val movedL = (survA.iterator ++ membA.iterator).flatMap { r =>
              val c2 = lbl(r.getLong(0))
              if (c2 != r.getLong(4)) Some(org.apache.spark.sql.Row(
                r.getLong(0), r.getString(1), r.getSeq[Long](2), r.getLong(3), c2))
              else None
            }
            // retract rows ride the same merge with the n_sh = -1
            // sentinel (never a real count) — one atomic commit
            val delL = remA.iterator.map(_.getLong(0)).filterNot(newIds2)
              .map(id => org.apache.spark.sql.Row(
                id, null, Seq.empty[Long], -1L, id))
            Some((newL ++ movedL ++ delL).toSeq)
          }
        }
      var ccToRelease: Option[DataFrame] = None
      val delta = deltaLocal match {
        case Some(rows) =>
          import scala.jdk.CollectionConverters._
          import org.apache.spark.sql.types._
          spark0.createDataFrame(rows.asJava, StructType(Seq(
            StructField("id", LongType, nullable = false),
            StructField("thash", StringType, nullable = true),
            StructField("sig", ArrayType(LongType), nullable = true),
            StructField("n_sh", LongType, nullable = false),
            StructField("comp", LongType, nullable = false))))
        case None =>
          val cc = labels match {
            case Some(lab) =>
              import scala.jdk.CollectionConverters._
              spark0.createDataFrame(
                lab.toSeq.map { case (id, c) =>
                  org.apache.spark.sql.Row(id, c) }.asJava,
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("id",
                    org.apache.spark.sql.types.LongType, nullable = false),
                  org.apache.spark.sql.types.StructField("_c",
                    org.apache.spark.sql.types.LongType, nullable = false))))
            case None =>
              val d = Dedup.connectedComponents(edges, "ia", "ib")
                .withColumnRenamed("comp", "_c")
              ccToRelease = Some(d)
              d
          }
          val newRows = newSigs.join(cc, Seq("id"), "left")
            .select(col("id"), col("thash"), col("sig"), col("n_sh"),
              coalesce(col("_c"), col("id")).as("comp"))
          val movedRows = survivors.unionByName(addMembers)
            .join(cc, Seq("id"), "left")
            .withColumn("_c2", coalesce(col("_c"), col("id")))
            .filter(col("_c2") =!= col("comp"))
            .select(col("id"), col("thash"), col("sig"), col("n_sh"),
              col("_c2").as("comp"))
          val delRows = removed
            .join(newSigs.select(col("id")), Seq("id"), "left_anti")
            .select(col("id"), lit(null).cast("string").as("thash"),
              array().cast("array<bigint>").as("sig"), lit(-1L).as("n_sh"),
              col("id").as("comp"))
          newRows.unionByName(movedRows).unionByName(delRows)
      }
      // delta rows are FULL state rows (newL/movedL carry every column,
      // delRows ride the n_sh = -1 sentinel), so the MOR tombstone
      // upsert is row-equivalent to the merge clauses — commitAux
      // dispatches on the state's table type (MOR for created states,
      // the locked COW merge for pre-upgrade roots and spec fixtures)
      IvmAux.dumpPlan("dedup state delta", delta)
      IvmAux.commitAux(state, delta, col("n_sh") === -1L,
        whenMatchedSet = StateCols.filter(_ != "id")
          .map(c => c -> col(s"src_$c")).toMap,
        delSrc = col("src_n_sh") === -1L,
        insSrc = col("src_n_sh") >= 0L,
        toSeq = toSeq,
        extraMeta = extraMeta + (AppliedSeqKey -> toSeq.toString),
        guard = Some(() => {
          val cur = appliedSeq(state)
          if (cur != Some(fromSeq)) throw new IllegalStateException(
            s"stale maintenance window ($fromSeq, $toSeq]: the state's " +
              s"applied watermark is ${cur.getOrElse("absent")} — " +
              "re-read the watermark (concurrent refresh?)")
        }))
      graft.util.StageTimer.mark("merge")
      // the CC labels are localCheckpoint-pinned like every other frame;
      // a long-lived maintainer calls maintain() per wave, so release
      // everything once applied (the finally's release() covers the
      // pinned frames; ccToRelease came from connectedComponents)
      ccToRelease.foreach(_.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false)))
      ()
    } finally release()
  }
}
