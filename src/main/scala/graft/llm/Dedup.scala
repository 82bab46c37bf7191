package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.RangeBucket

/** Content-level deduplication over document corpora — the operators a
  * large-scale training-data pipeline runs before anything else. All are
  * shuffle-on-key patterns that scale linearly: no all-pairs crossJoin
  * anywhere; candidate pairs always come from an inverted-index-style
  * equi-join (shingle, band, or hash bucket), which Spark executes as a
  * hash shuffle join — the 100 TB shape.
  */
object Dedup {

  /** Default posting-list document-frequency cap for the exact-Jaccard
    * surface ([[jaccardPairs]]/[[containmentPairs]]/[[jaccardComponents]]):
    * a shingle in more than this many documents is treated as a
    * stop-shingle. Mirrors [[minhashComponents]]' default band-bucket cap
    * so every public pair generator is bounded by default. */
  val DefaultDocFreqCap = 1024


  /** Word n-gram shingles, distinct per doc: (id, shingle). The word array
    * is materialized once per row (splitting inside the transform lambda
    * would re-tokenize per element — O(words²)). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val w = col("_w")
    val sh = when(size(w) < n, array().cast("array<string>"))
      .otherwise(expr(
        s"transform(sequence(1, size(_w) - ${n - 1}), " +
          s"i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(_w, i + $j)").mkString(", ")}))"))
    // Fan.widen: a one-split corpus scan would run the explode on 1-2
    // tasks (guide §2.5); pinned/local wave frames pass through untouched
    graft.util.Fan.widen(docs)
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), explode(sh).as("s"))
      .filter(col("s").isNotNull && length(col("s")) > 0)
      .distinct()
  }

  /** CHUNK-LEVEL near-duplicate pairs: documents sharing >= `minShared`
    * identical fixed-window chunks ([[TextAnalysis.charChunks]] — same
    * window/stride as the chunk store, so a hit names the EXACT reusable
    * chunks). The candidate generator is a posting-list equi-join on the
    * chunk hash, never all-pairs; chunks appearing in more than `maxDf`
    * documents (boilerplate — headers, licenses, empty windows) are
    * dropped from the postings first, which both bounds the join's hot
    * keys at 100 TB and is exactly the signal-vs-boilerplate split
    * chunk dedup wants. One distinct + one self equi-join + one
    * aggregate: the linear-scale shape.
    */
  def chunkOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int, minShared: Int, maxDf: Int): DataFrame = {
    val dist = TextAnalysis.charChunks(docs, idCol, textCol, window, stride)
      .select(col(idCol).as("doc"), col("chunk_md5").as("h"))
      .distinct()
    val rare = dist.groupBy(col("h"))
      .agg(count(lit(1)).as("_df")).filter(col("_df") <= maxDf)
      .select(col("h"))
    val keep = dist.join(rare, Seq("h"))
    keep.as("a").join(keep.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }

  /** Exact duplicate groups by content hash (md5). One hash-shuffle. */
  def exactStats(docs: DataFrame, textCol: String): DataFrame = {
    val byHash = docs.groupBy(md5(col(textCol)).as("h")).agg(count(lit(1)).as("n"))
    byHash.agg(
      sum(col("n")).as("n_docs"),
      count(lit(1)).as("n_groups"),
      count(when(col("n") > 1, 1)).as("n_dup_groups"),
      coalesce(sum(when(col("n") > 1, col("n") - 1)), lit(0L)).as("n_redundant"))
  }

  /** Exact n-gram Jaccard similar pairs via shingle inverted index:
    * pairs sharing a shingle → |A∩B| by count, |A∪B| = |A|+|B|−|A∩B|.
    * Join key is the shingle, so work is proportional to posting-list
    * sizes, not to the number of document pairs.
    *
    * `maxDocFreq` caps the posting list: a corpus-common shingle with
    * document frequency p contributes p² candidate rows to the self-join —
    * the classic inverted-index blowup at 100 TB. Shingles above the cap
    * carry no discriminative signal and are dropped from BOTH the index
    * and the per-doc counts, so the result is the exact Jaccard over the
    * discriminative-shingle space (consistent, deterministic semantics —
    * the standard stop-shingle treatment). The hot set is at most
    * |postings|/cap shingles, hence broadcastable.
    *
    * The cap is ON BY DEFAULT ([[DefaultDocFreqCap]], mirroring the
    * banded generators' bucket caps): an uncapped posting self-join is
    * quadratic in its hottest posting list, which is the one default a
    * crawl-scale caller must never inherit by accident. Pass an explicit
    * `None` to opt into the exact uncapped join on corpora known to have
    * no stop-shingles.
    */
  /** Shared posting-join core: undirected pairs sharing ≥1 shingle with
    * (ia, ib, inter, na, nb) — intersection count plus both docs' shingle
    * counts. One shingle equi-join; Jaccard and containment are both one
    * arithmetic step away. */
  private def pairOverlaps(docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Option[Int]): DataFrame = {
    val sh0 = shingles(docs, idCol, textCol)
    // NOT cached: the shingle subtree feeds three shuffles (posting join's
    // two sides + the per-doc counts), but its own deduplicating exchange
    // is IDENTICAL under canonicalization in every branch, so Spark's
    // ReuseExchange computes the scan→explode→distinct prefix once and the
    // three consumers re-read its shuffle output. A .cache() here would be
    // marginally faster but leaks executor memory past the query's
    // lifetime (nothing ever unpersists a lazily returned plan) —
    // LlmSpec pins both the reuse and the no-leak contract.
    val sh = maxDocFreq match {
      case Some(cap) =>
        val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("s"))
        sh0.join(broadcast(hot), Seq("s"), "left_anti")
      case None => sh0
    }
    val cnt = sh.groupBy(col(idCol).as("id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("ia"), col("s"))
    val b = sh.select(col(idCol).as("ib"), col("s"))
    a.join(b, Seq("s")).filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
      .join(cnt.withColumnRenamed("id", "ia").withColumnRenamed("n_sh", "na"), Seq("ia"))
      .join(cnt.withColumnRenamed("id", "ib").withColumnRenamed("n_sh", "nb"), Seq("ib"))
  }

  /** Exact n-gram Jaccard similar pairs via the shared posting join:
    * J = |A∩B| / (|A|+|B|−|A∩B|). With `maxDocFreq` set, shingles above
    * the cap drop from BOTH the index and the per-doc counts (the
    * stop-shingle treatment — see [[pairOverlaps]]), so the result is the
    * exact Jaccard over the discriminative-shingle space. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5,
      maxDocFreq: Option[Int] = Some(Dedup.DefaultDocFreqCap)): DataFrame =
    pairOverlaps(docs, idCol, textCol, maxDocFreq)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("ia"), col("ib"), round(col("jaccard"), 4).as("jaccard"))

  /** CONTAINMENT near-dup pairs — the asymmetric complement to Jaccard:
    * C(A→B) = |A∩B| / |A| flags A as (near-)contained in B, which catches
    * excerpts, quotes and subset documents whose Jaccard stays low because
    * the larger doc dilutes the union (the standard companion measure in
    * crawl dedup). Same inverted-index shape as [[jaccardPairs]] — one
    * shingle equi-join, work proportional to posting lists — with BOTH
    * directions scored from the single undirected intersection count.
    * Emits (inner, outer, containment): inner's shingles are ≥ threshold
    * covered by outer.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8,
      maxDocFreq: Option[Int] = Some(Dedup.DefaultDocFreqCap)): DataFrame =
    // both directions come out of ONE pass over the scored pairs (explode,
    // not a self-union — a union of two selects would re-run the whole
    // posting join per branch)
    pairOverlaps(docs, idCol, textCol, maxDocFreq)
      .select(col("inter"), explode(array(
        struct(col("ia").as("id_in"), col("ib").as("id_out"), col("na").as("n_in")),
        struct(col("ib").as("id_in"), col("ia").as("id_out"), col("nb").as("n_in"))))
        .as("d"))
      .select(col("d.id_in").as("id_in"), col("d.id_out").as("id_out"),
        (col("inter").cast("double") / col("d.n_in")).as("c"))
      .filter(col("c") >= threshold)
      .select(col("id_in"), col("id_out"), round(col("c"), 4).as("containment"))

  /** Duplicated-passage census — the shingle-granular approximation of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"): per document, how much of it is
    * made of n-grams that also occur in OTHER documents. Two hash
    * aggregates and one posting join on the shingle — work proportional
    * to posting-list sizes, the same 100 TB shape as [[jaccardPairs]].
    * A shingle counts as duplicated when its corpus document frequency is
    * ≥ 2 (it appears verbatim somewhere else); the per-doc ratio is the
    * boilerplate/copied-span signal a crawl pipeline filters on. All
    * counts integral; the single final division is exact-replicable.
    * Returns (id, n_shingles, n_dup, dup_ratio) for docs whose ratio is
    * ≥ `minRatio`.
    */
  def duplicatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minRatio: Double = 0.0): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    sh.join(df, Seq("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("df") >= 2, 1)).as("n_dup"))
      .withColumn("dup_ratio",
        round(col("n_dup").cast("double") / col("n_shingles"), 4))
      .filter(col("dup_ratio") >= minRatio)
  }

  /** MinHash signature column: array of 64 per-permutation minima. The
    * shingle string is hashed ONCE (xxhash64); the permutations re-hash
    * only the resulting long inside [[graft.functions.MinHashSig]] — a
    * single native TypedImperativeAggregate holding one 64-long buffer
    * (vs 64 separate min-aggregate states), bit-identical to
    * `min(xxhash64(lit(i), h))` per permutation.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, perms: Int = 64): DataFrame = {
    graft.functions.MinHashFunctions.register(sh.sparkSession)
    sh.withColumn("_h", xxhash64(col("s")))
      .groupBy(col(idCol))
      .agg(graft.functions.MinHashFunctions.minhashSig(col("_h"), perms).as("sig"))
  }

  /** MinHash-LSH near-dup pairs: band the signature (bands × rows = perms),
    * hash each band, equi-join on (band, hash) for candidates, then verify
    * candidates with exact Jaccard. Candidate generation is a shuffle join
    * on band hash — never all-pairs.
    *
    * Two guards keep the band join linear in TRUE output at crawl scale,
    * where thousands of byte-identical copies of one page are the norm:
    *
    *  - **identical signatures collapse before banding.** Docs sharing a
    *    full signature become ONE representative in the band join (a
    *    1k-copy cluster contributed 16 bands × 500k pairs to the old
    *    join; it now contributes one row per band), and their member
    *    pairs are emitted directly from a signature equi-join — already
    *    proportional to the true pair output, each pair exactly once,
    *    and still exactly verified (an across-set signature collision
    *    must not fake a Jaccard).
    *  - **dense cross-signature buckets are capped.** A (band, hash)
    *    bucket holding more than `maxBandFreq` DISTINCT signatures stops
    *    generating pairs — the quadratic-candidate guard `maxDocFreq`
    *    already gives the shingle postings. RECALL CONTRACT: a pair is
    *    found iff some band bucket of ≤ `maxBandFreq` distinct
    *    signatures contains both — distinct signatures differ somewhere,
    *    so a capped bucket's docs normally still meet in their other,
    *    sparser bands; identical docs are NEVER affected (one rep — no
    *    bucket density from copies). The default is far above any sane
    *    bucket density; lower it only with the contract in mind.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, bands: Int = 16, rows: Int = 4,
      maxBandFreq: Int = 1024): DataFrame = {
    // uncached for the same reason as [[pairOverlaps]]: every consumer
    // (signature agg, count table, both posting sides) shuffles the same
    // canonicalized shingle subtree, so ReuseExchange shares one
    // computation without pinning executor memory for the session
    val sh = shingles(docs, idCol, textCol)
    val cand = minhashCandidates(sh, idCol, bands, rows, maxBandFreq)

    // exact verification of the candidate set, prefiltered by the exact
    // size bound J ≤ min(|A|,|B|)/max(|A|,|B|): a candidate whose
    // shingle-count ratio is under the threshold can never verify, so it
    // is dropped BEFORE the two posting-list joins (the expensive step —
    // the count table is one row per doc, orders of magnitude smaller)
    val cnt = sh.groupBy(col(idCol).as("id")).agg(count(lit(1)).as("n_sh"))
    val sized = cand
      .join(cnt.withColumnRenamed("id", "ia").withColumnRenamed("n_sh", "na"), Seq("ia"))
      .join(cnt.withColumnRenamed("id", "ib").withColumnRenamed("n_sh", "nb"), Seq("ib"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")))
    val inter = sized
      .join(sh.select(col(idCol).as("ia"), col("s")), Seq("ia"))
      .join(sh.select(col(idCol).as("ib"), col("s").as("s2")), Seq("ib"))
      .filter(col("s") === col("s2"))
      .groupBy(col("ia"), col("ib"), col("na"), col("nb")).agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("ia"), col("ib"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** [[minhashPairs]] with PRECOMPUTED signatures: `sigRows` = one row
    * per doc `(id, sig, n_sh)` from a signature store whose sigs are
    * bit-identical to [[minhashSignatures]]' output (the
    * [[IncrementalDedup]] state contract); `docs` = the same documents'
    * `(idCol, textCol)` rows, consulted ONLY for the exact-jaccard
    * verification shingles. Same candidate algebra (signature collapse,
    * banding, density cap, within-signature pairs) and the same output
    * contract as [[minhashPairs]] — minus the signature aggregation, the
    * expensive step, which a maintained state should never recompute. */
  private[graft] def minhashPairsFromSigs(sigRows: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, threshold: Double, bands: Int,
      rows: Int, maxBandFreq: Int): DataFrame = {
    val member = sigRows.select(col("id"), col("sig"))
    val (memberRid, _, repPairs) = collapsedRepPairs(member,
      reps => minhashBandBuckets(reps, bands, rows), maxBandFreq)
    val cand = withinSigPairs(memberRid)
      .unionByName(expandRepPairs(memberRid, repPairs))
      .distinct()
    val cnt = sigRows.select(col("id"), col("n_sh"))
    val sized = cand
      .join(cnt.toDF("ia", "na"), Seq("ia"))
      .join(cnt.toDF("ib", "nb"), Seq("ib"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")))
    val sh = shingles(docs, idCol, textCol)
    val inter = sized
      .join(sh.select(col(idCol).as("ia"), col("s")), Seq("ia"))
      .join(sh.select(col(idCol).as("ib"), col("s").as("s2")), Seq("ib"))
      .filter(col("s") === col("s2"))
      .groupBy(col("ia"), col("ib"), col("na"), col("nb")).agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("ia"), col("ib"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Crawl-scale candidate scaffolding SHARED by [[minhashPairs]] and
    * [[simhashPairs]] — the uniform five-step guard for signature-bucket
    * pair generators, kept in one place so the two cannot drift:
    *
    *  1. identical signatures collapse to one representative (the min
    *     member id doubles as a compact LONG rep key, so the signature
    *     itself crosses a shuffle exactly once — in the member→rep join);
    *  2. `bandsOf` lays the reps out in buckets (bk1, bk2) — minhash
    *     bands, simhash chunks;
    *  3. buckets holding more than `maxFreq` DISTINCT signatures stop
    *     generating pairs (the count window is LINEAR in the bucket; the
    *     quadratic step it guards is the self-join);
    *  4. admitted reps self-join per bucket into distinct rep pairs;
    *  5. callers expand rep pairs to member pairs ([[expandRepPairs]])
    *     and add the within-signature pairs ([[withinSigPairs]]) —
    *     output-proportional by construction.
    *
    * Returns (memberRid (rid, id), reps (sig, rid), repPairs (ra, rb)).
    */
  private def collapsedRepPairs(member: DataFrame,
      bandsOf: DataFrame => DataFrame, maxFreq: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(maxFreq >= 1, s"bucket cap must be >= 1 (got $maxFreq)")
    val reps = member.groupBy(col("sig")).agg(min(col("id")).as("rid"))
    val memberRid = member.join(reps, Seq("sig")).select(col("rid"), col("id"))
    val counted = bandsOf(reps).withColumn("_nb", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bk1"), col("bk2"))))
    // the cap makes a formerly-exact generator approximate under
    // dense-bucket corpora — make that loss OBSERVABLE, never silent: a
    // CollectMetrics node counts the capped buckets/rows in the same
    // pass (no extra job), and a session listener logs any nonzero hit.
    // Only the LEFT join side carries the observation: a duplicated
    // CollectMetrics node (self-join) loses its metrics under AQE, so
    // the right side recomputes the same lineage unobserved.
    // DISTINCT aggregates are disallowed in observed metrics; every row
    // of a bucket carries the same _nb, so sum(1/_nb) over capped rows
    // counts capped BUCKETS exactly (rounded in the listener).
    CapObservability.install(member.sparkSession)
    val observed = counted.observe(CapObservability.freshName(),
      sum(when(col("_nb") > maxFreq, lit(1.0) / col("_nb"))
        .otherwise(lit(0.0))).as("capped_buckets"),
      sum(when(col("_nb") > maxFreq, lit(1L)).otherwise(lit(0L)))
        .as("capped_sig_rows"))
    val admittedObs = observed.filter(col("_nb") <= maxFreq)
    val admitted = counted.filter(col("_nb") <= maxFreq)
    val repPairs = admittedObs.as("x").join(admitted.as("y"),
        col("x.bk1") === col("y.bk1") && col("x.bk2") === col("y.bk2") &&
          col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("ra"), col("y.rid").as("rb")).distinct()
    (memberRid, reps, repPairs)
  }

  /** Expand rep pairs (ra, rb, extra...) to canonically-oriented member
    * pairs (ia, ib, extra...). */
  private def expandRepPairs(memberRid: DataFrame, repPairs: DataFrame): DataFrame = {
    val extra = repPairs.columns.filterNot(c => c == "ra" || c == "rb")
    repPairs
      .join(memberRid.select(col("rid").as("ra"), col("id").as("ia")), Seq("ra"))
      .join(memberRid.select(col("rid").as("rb"), col("id").as("ib")), Seq("rb"))
      .select((Seq(least(col("ia"), col("ib")).as("ia"),
        greatest(col("ia"), col("ib")).as("ib")) ++ extra.map(col)): _*)
  }

  /** All (ia < ib) member pairs sharing a signature — every one a true
    * duplicate-cluster pair, emitted exactly once. */
  private def withinSigPairs(memberRid: DataFrame): DataFrame =
    memberRid.as("a").join(memberRid.as("b"),
        col("a.rid") === col("b.rid") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"))

  /** The per-band bucket hashes of a `sig` column as one array<bigint>
    * (index = band) — THE band formula and the single source of truth
    * for band-bucket identity, shared by [[minhashBandBuckets]] (the
    * batch candidate generator) and [[IncrementalDedup]]'s join-free
    * band-store row generator, so the two can never hash a band
    * differently (a drift would silently diverge the store's pruned
    * census from a rebuild). */
  private[graft] def bandBucketArray(bands: Int, rows: Int): org.apache.spark.sql.Column =
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"b -> xxhash64(b, ${(0 until rows).map(r => s"element_at(sig, b * $rows + $r + 1)").mkString(", ")}))")

  private[graft] def minhashBandBuckets(reps: DataFrame, bands: Int,
      rows: Int): DataFrame =
    reps.select(col("rid"), posexplode(bandBucketArray(bands, rows)))
      .select(col("rid"), col("pos").as("bk1"), col("col").as("bk2"))

  /** The [[minhashPairs]] candidate generator (exposed for the skew
    * tests): signature-collapsed band-LSH pairs ∪ within-signature
    * member pairs, canonically oriented (ia < ib), distinct. */
  private[graft] def minhashCandidates(sh: DataFrame, idCol: String,
      bands: Int, rows: Int, maxBandFreq: Int): DataFrame = {
    val member = minhashSignatures(sh, idCol)
      .select(col(idCol).as("id"), col("sig"))
    val (memberRid, _, repPairs) = collapsedRepPairs(member,
      reps => minhashBandBuckets(reps, bands, rows),
      maxBandFreq)
    withinSigPairs(memberRid)
      .unionByName(expandRepPairs(memberRid, repPairs))
      .distinct()
  }

  /** Connected components over an undirected edge list — the step that
    * turns near-dup PAIRS into dedup GROUPS (keep one representative per
    * group). Alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): each round hangs
    * every node off the minimum of its neighborhood, which contracts
    * paths by roughly squaring — rounds grow with log(component
    * diameter), not the diameter itself. Min-label propagation (the
    * classic MapReduce-CC shape this replaces) needs rounds ∝ diameter:
    * a chain-shaped near-dup cluster — common at web scale, where doc A
    * near-dups B near-dups C without A resembling C — multiplies
    * shuffles linearly there and logarithmically here, at the same
    * per-round cost (one shuffle groupBy + one shuffle join each).
    * `localCheckpoint` truncates lineage each round — without it the
    * iterated plan tree grows exponentially and kills the driver at
    * scale long before the data does.
    *
    * Returns (id, comp) for every vertex that appears in `edges`.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame =
    connectedComponentsCounted(edges, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the round count — exposed so the
    * log-convergence bound is testable (LlmSpec pins a 256-chain). */
  private[graft] def connectedComponentsCounted(edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20): (DataFrame, Int) = {
    // Checkpoint lifecycle: each localCheckpoint pins an RDD in executor
    // memory; superseded rounds are unpersisted EAGERLY. Only the
    // RETURNED labels stay pinned — a localCheckpoint truncates lineage,
    // so unpersisting the result would make it unrecomputable.
    def pinned(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    def release(df: DataFrame): Unit =
      pinned(df).foreach(_.unpersist(blocking = false))
    val e0 = edges.select(col(aCol).as("u"), col(bCol).as("v"))
    val vertices = e0.select(col("u").as("id"))
      .union(e0.select(col("v").as("id"))).distinct().localCheckpoint()
    // work on canonically directed (big → small) distinct edges
    var cur = e0.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()

    /** large-star: every node links its LARGER neighbors to the minimum
      * of its full neighborhood (including itself). */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    /** small-star: every node links its smaller-or-equal neighbors (and
      * itself) to the minimum among them. */
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      e.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    }

    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        val next = smallStar(largeStar(cur)).localCheckpoint()
        // fixpoint: the directed edge set is stable (stars stay stars)
        converged = next.exceptAll(cur).isEmpty && cur.exceptAll(next).isEmpty
        release(cur)
        cur = next
        iter += 1
      }
      if (!converged) {
        release(cur)
        throw new IllegalStateException(
          s"connectedComponents did not converge after $maxIter rounds; raise maxIter")
      }
      // stable state is a star forest: (u, root) edges. Roots and isolated
      // vertices (self-loop-only inputs) label themselves.
      val labels = vertices.as("vs")
        .join(cur.select(col("u").as("id"), col("v").as("c")), Seq("id"), "left")
        .select(col("id"), coalesce(col("c"), col("id")).as("comp"))
        .localCheckpoint()
      release(cur)
      (labels, iter)
    } finally release(vertices)
  }

  /** Benchmark decontamination: drop training documents whose exact
    * content hash appears in a held-out evaluation corpus. One distinct
    * over the (small) eval side + a hash anti-join — the eval hash set is
    * broadcastable at any realistic eval-corpus size, so the 100 TB train
    * side never shuffles. Returns a one-row summary.
    */
  def decontaminate(docs: DataFrame, textCol: String, isEval: Column): DataFrame = {
    val hashed = docs.withColumn("_h", md5(col(textCol)))
    val evalHashes = hashed.filter(isEval).select(col("_h")).distinct()
    val train = hashed.filter(!isEval)
    val kept = train.join(broadcast(evalHashes), Seq("_h"), "left_anti")
    train.agg(count(lit(1)).as("n_train"))
      .crossJoin(evalHashes.agg(count(lit(1)).as("n_eval")))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
      .select(col("n_train"), col("n_eval"),
        (col("n_train") - col("n_kept")).as("n_removed"), col("n_kept"))
  }

  /** N-gram decontamination (the GPT-3/PaLM recipe, vs the exact-hash
    * variant in [[decontaminate]]): a training document is contaminated if
    * it shares ANY word n-gram with the held-out eval corpus. The distinct
    * eval n-gram set is broadcast (eval corpora are tiny next to training
    * data), so the 100 TB train side is one scan + a broadcast semi-join —
    * the corpus never shuffles. Returns a one-row summary.
    */
  def ngramDecontaminate(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int = 8): DataFrame = {
    val eval = docs.filter(isEval)
    val train = docs.filter(!isEval)
    val evalGrams = shingles(eval, idCol, textCol, n).select(col("s")).distinct()
    val flagged = shingles(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("s"), "left_semi")
      .select(col(idCol)).distinct()
    train.agg(count(lit(1)).as("n_train"))
      .crossJoin(flagged.agg(count(lit(1)).as("n_flagged")))
      .select(col("n_train"), col("n_flagged"),
        (col("n_train") - col("n_flagged")).as("n_clean"))
  }

  /** 64-bit SimHash: per bit, sum ±1 over token occurrences; bit set if the
    * sum is positive. The per-token bit source is the first 16 hex digits
    * of md5 (bit b = bit b%4 of digit b/4) — chosen over xxhash64 because
    * md5 digits are portable across engines, which makes the whole SimHash
    * computation expressible in ANSI-ish SQL and therefore ORACLE-checkable
    * end to end (the hash quality is equivalent). Near-dups = pairs with
    * small Hamming distance, bucketed by 16-bit chunks for candidate
    * generation (a pair within distance d<4 shares ≥1 of 4 chunks).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = graft.util.Fan.widen(docs)
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("m", substring(md5(col("w")), 1, 16))
    val bitCols = (0 until 64).map { b =>
      val digit = conv(substring(col("m"), b / 4 + 1, 1), 16, 10).cast("int")
      sum(when(shiftright(digit, b % 4).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    tok.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
      .select(col(idCol),
        (0 until 64).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** EXACT duplicated-substring census via sorted-suffix neighbors — the
    * suffix-array method of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"), re-expressed as Spark relational
    * operators instead of a monolithic in-memory suffix array:
    *
    *  1. explode every `stride`-th suffix start (stride 1 — the
    *     default — is exact; stride q subsamples start positions at the
    *     paper's own engineering trade: a duplicated run is detected
    *     iff it covers a sampled position, so recall for runs of length
    *     ≥ minMatch + q − 1 is unchanged and shorter ones trade at
    *     known odds, while explode volume divides by q — the 100-TB
    *     cost knob, graded at q=4), truncated to `maxSuffix` chars;
    *  2. collapse to DISTINCT suffix values with counts (map-side-combined
    *     `groupBy` — identical-value skew dies here: a boilerplate
    *     sentence repeated 10⁹ times arrives pre-aggregated, and a
    *     duplicated value's max-LCP is its own length by definition, no
    *     sort ever sees the copies);
    *  3. lay the distinct values out in range buckets cut at boundaries
    *     sampled from the distinct values themselves, sort per bucket,
    *     and take each value's LCP with its sorted neighbors (the
    *     suffix-array property: a suffix's maximal LCP with ANY other
    *     suffix is attained at an adjacent suffix in sorted order); the
    *     adjacent pair spanning each bucket boundary is completed from
    *     per-bucket extremes, so the layout moves WHERE the
    *     sort runs, never the answer;
    *  4. join the value-level LCP back to the instances and census per
    *     document: how many positions start a duplicated substring of
    *     ≥ `minMatch` chars, and the longest duplicated run (exact up to
    *     the `maxSuffix` cap, which long runs report).
    *
    * A position's `lcp` depends only on the corpus's suffix MULTISET, so
    * the census is deterministic (over the stride's sampled suffix
    * multiset) and independent of `buckets` — chars-in-corpus/stride
    * rows of ~`maxSuffix` bytes, no all-pairs anywhere.
    * The LAYOUT has no hot key by construction: identical
    * values never meet a sort, and per-bucket distinct-value load is
    * bounded by quantile-sampling error, not by Zipfian prefix mass (the
    * round-11 hazard of prefix-bucketed windows, where one common 8-char
    * opening could concentrate a corpus share on a single task).
    */
  def suffixDuplication(docs: DataFrame, idCol: String, textCol: String,
      minMatch: Int = 20, maxSuffix: Int = 60, buckets: Int = 128,
      stride: Int = 1): DataFrame =
    suffixLcps(docs, idCol, textCol, minMatch, maxSuffix, buckets, stride)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sfx"),
        sum(when(col("lcp") >= minMatch, 1L).otherwise(0L)).as("dup_positions"),
        max(col("lcp")).cast("long").as("max_dup_len"))

  /** The sorted-suffix LCP core shared by [[suffixDuplication]] (census)
    * and [[suffixDedupTexts]] (removal): per suffix start, its maximal
    * LCP with ANY other suffix in the corpus (exact up to the `maxSuffix`
    * truncation). Returns (doc_id, pos, lcp).
    *
    * `buckets` shapes only the LAYOUT, never the answer. Two skew guards
    * make the layout 100-TB-safe where a sort key follows a Zipfian
    * corpus: (1) identical suffix values collapse through a map-side-
    * combined `groupBy` before any sort — a duplicated value's max-LCP
    * is `length(s)` by definition; (2) the DISTINCT values (unique by
    * construction, so no residual hot key) sort inside range buckets cut
    * at boundaries derived from a bounded, deterministic doc sample
    * (distinct suffix candidates, byte-sorted, evenly cut), and the
    * adjacent pair spanning each bucket boundary is completed from
    * per-bucket extremes, so no neighbor pair is lost to the
    * partitioning. Boundaries collect once into plan literals — every
    * job in the chain buckets identically — and the extremes derive
    * from the same distinct-value aggregate as the sort input inside
    * ONE plan, so the full suffix multiset is aggregated exactly once
    * (the groupBy(s) exchange is reused, not recomputed). */
  /** The exploded (doc_id, pos, s) truncated-suffix multiset —
    * [[suffixLcps]]'s input, exposed so the explode pass can be timed
    * alone (PERF_NOTES carries its share of the census: the plan
    * computes this subtree 2× — the value aggregate, whose exchange the
    * bucket-extreme branch reuses, and the instance join — as a
    * deliberate no-cache trade). */
  private[graft] def suffixMultiset(docs: DataFrame, idCol: String,
      textCol: String, minMatch: Int, maxSuffix: Int,
      stride: Int = 1): DataFrame =
    graft.util.Fan.widen(docs)
      .filter(length(col(textCol)) >= minMatch)
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"),
        explode(sequence(lit(1), length(col(textCol)) - lit(minMatch - 1),
          lit(stride))).as("pos"))
      .select(col("doc_id"), col("pos"),
        col("_t").substr(col("pos"), lit(maxSuffix)).as("s"))

  private def suffixLcps(docs: DataFrame, idCol: String, textCol: String,
      minMatch: Int, maxSuffix: Int, buckets: Int, stride: Int = 1): DataFrame = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    require(stride >= 1, s"stride must be >= 1 (got $stride)")
    require(minMatch <= maxSuffix, s"minMatch ($minMatch) must be <= maxSuffix ($maxSuffix)")
    graft.functions.TextFunctions.registerLcp(docs.sparkSession)
    // LCP of two suffixes via the native fused expression
    // ([[graft.functions.StringLcp]] — one O(L) byte walk in codegen;
    // the composable higher-order-filter form copies O(L²) chars per
    // comparison, which dominated the whole census); a missing neighbor
    // keeps the old no-neighbor-means-0 contract
    def lcp(a: Column, b: Column): Column =
      coalesce(graft.functions.TextFunctions.lcp(a, b), lit(0))
    val sfx = suffixMultiset(docs, idCol, textCol, minMatch, maxSuffix, stride)
    // Boundary sample, BOUNDED IN BYTES and computed executor-side: a
    // deterministic md5-ordered TakeOrdered draws ≤2048 docs (one k-heap
    // pass, no shuffle), duplicates-by-text collapse (so a corpus that
    // is mostly copies of one page still contributes diverse cuts up to
    // that draw), and from ≤512 surviving texts at most 64 evenly-spaced
    // truncated suffixes EACH are extracted before anything reaches the
    // driver — ≤32k strings of ≤`maxSuffix` chars, never a full
    // document. Cuts track the sampled-doc suffix distribution: the
    // identical-value collapse below absorbs hot-VALUE mass regardless,
    // and residual distinct-value imbalance is bounded by the rare-doc
    // share of the draw (the e2e tests pin bucket-independence of the
    // RESULT either way). The main plan then aggregates the suffix
    // multiset ONCE — no cache, no second full shuffle; boundaries are
    // plan literals, so every job buckets identically by construction.
    val nStarts = length(col("_t")) - lit(minMatch - 1)
    val cand = docs
      .filter(length(col(textCol)) >= minMatch)
      .select(col(textCol).as("_t"))
      .orderBy(md5(col("_t")), col("_t")).limit(2048)
      .dropDuplicates("_t")
      // re-sort: dropDuplicates does not preserve order, so without this
      // the trailing limit would pick an arbitrary (run-varying) subset
      .orderBy(md5(col("_t")), col("_t")).limit(512)
      .select(explode(sequence(lit(1), nStarts,
        greatest(lit(1), (nStarts / 64).cast("int")))).as("p"), col("_t"))
      .select(col("_t").substr(col("p"), lit(maxSuffix)).as("s"))
      .distinct()
      .collect().map(_.getString(0)).sorted(RangeBucket.Utf8Ordering)
    val step = math.max(1, cand.length / buckets)
    val boundaries: Array[String] =
      (step until cand.length by step).map(i => cand(i - 1))
        .take(buckets - 1).toArray
    val bkt = RangeBucket.bucketCol(col("s"), boundaries.toSeq)
    val byVal = sfx.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("_b", bkt)
    // cross-boundary completion: a bucket-min's global predecessor is the
    // previous NONEMPTY bucket's max (and symmetrically for the max).
    // The per-bucket extremes derive from the SAME distinct-value
    // aggregate as the window input — one plan, so the groupBy(s)
    // exchange (the full explode pass) is computed ONCE and reused
    // (ReusedExchangeExec) instead of a separate driver collect
    // recomputing the multiset. Extremes over distinct values ARE the
    // extremes over instances. Neighbors come from the ≤`buckets`-row
    // sorted extreme array (collect_list through a 1-row aggregate +
    // posexplode — no second window pass, no nested-loop join), then
    // broadcast equi-join back on the bucket id.
    val nbr = byVal.groupBy(col("_b"))
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
      .agg(sort_array(collect_list(struct(col("_b"), col("mn"), col("mx"))))
        .as("e"))
      .select(col("e"), posexplode(col("e")))
      .select(col("col")("_b").as("_b"),
        get(col("e"), col("pos") + 1)("mn").as("next_mn"),
        when(col("pos") > 0, get(col("e"), col("pos") - 1)("mx"))
          .as("prev_mx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("s"))
    val valLcp = byVal.join(broadcast(nbr), Seq("_b"), "left")
      .select(col("s"),
        when(col("cnt") >= 2, length(col("s"))).otherwise(greatest(
          lcp(col("s"), coalesce(lead(col("s"), 1).over(w), col("next_mn"))),
          lcp(col("s"), coalesce(lag(col("s"), 1).over(w), col("prev_mx"))))).as("lcp"))
    // Instance join on the VALUE DIGEST, as a shuffled-hash join
    // (round-22; guide §3.1 + §2.3). Two problems with the plain
    // `sfx.join(valLcp, "s")`:
    //  1. Catalyst's size estimate after a Generate (explode) stays at
    //     input-file scale, so the 1.5M-row instance side read as "small"
    //     and was BROADCAST — a single-threaded ~100 MB HashedRelation
    //     build (~3 s per run, the biggest stage of the census) that
    //     would be a driver OOM at corpus scale. The SHUFFLE_HASH hint
    //     outranks size-estimated broadcasts in join selection, pinning
    //     a shuffled-hash join with the distinct-value side as build.
    //  2. The join key was the ≤60-char suffix itself; both sides now
    //     exchange a fixed 16-byte md5 digest instead (the engine's
    //     documented hash-equality convention) — ~4× fewer key bytes
    //     shuffled on the instance side and constant-width comparisons.
    // The value side stays distinct-by-s, so digest equality changes the
    // join pairs only on an md5 collision.
    val sfxH = sfx.select(col("doc_id"), col("pos"),
      unhex(md5(col("s"))).as("_h"))
    val valH = valLcp.select(unhex(md5(col("s"))).as("_h"), col("lcp"))
    sfxH.join(valH.hint("shuffle_hash"), Seq("_h"))
      .select(col("doc_id"), col("pos"), col("lcp"))
  }

  /** EXACT duplicated-substring REMOVAL — the output the Lee et al.
    * pipeline actually ships: every duplicated run of ≥ `minMatch` chars
    * is CUT from the text, and the document is reconstructed from the
    * surviving gaps (their trained models drop one copy; cutting every
    * occurrence is the symmetric set-based variant an engine can compute
    * without electing owners — boilerplate disappears entirely, which is
    * the dominant use).
    *
    *  1. [[suffixLcps]] marks duplicated START positions; each
    *     contributes the interval [pos, pos+lcp) (runs longer than
    *     `maxSuffix` are covered by their successive start positions —
    *     every position inside a long duplicated run starts a duplicated
    *     suffix itself, so coverage does not truncate at the cap);
    *  2. intervals merge per doc with one running-max window
    *     (partitioned by doc — bounded state);
    *  3. the kept text is the ordered concatenation of the complement
    *     gaps, rebuilt with order-pinned array_sort (collect_list order
    *     is not a contract).
    *
    * Returns (doc_id, n_chars, removed_chars, kept_md5) — the census
    * plus a hash of the TRANSFORMED text, so the surgery itself is
    * verifiable. Docs with nothing duplicated (or shorter than
    * `minMatch`) keep their text byte-identically.
    */
  def suffixDedupTexts(docs: DataFrame, idCol: String, textCol: String,
      minMatch: Int = 20, maxSuffix: Int = 60, buckets: Int = 128): DataFrame = {
    val ivs = suffixLcps(docs, idCol, textCol, minMatch, maxSuffix, buckets)
      .filter(col("lcp") >= minMatch)
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + col("lcp")).as("e"))
    // merge overlapping/adjacent intervals: a new segment starts where
    // this start exceeds the running max end of everything before it
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("s", "e")
    val prevMaxE = max(col("e")).over(wDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val merged = ivs
      .withColumn("new_seg", when(prevMaxE.isNull || col("s") > prevMaxE, 1L)
        .otherwise(0L))
      .withColumn("seg", sum(col("new_seg")).over(
        wDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("seg"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    // complement gaps: the piece BEFORE each merged interval, plus — from
    // the LAST interval per doc — the tail. One window marks both, so the
    // corpus text joins the intervals ONCE (not once per piece kind)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("_t"),
      length(col(textCol)).as("_len"))
    val wSeg = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("s")
    val withText = merged
      .withColumn("gap_s", coalesce(lag(col("e"), 1).over(wSeg), lit(1)))
      .withColumn("is_last", lead(col("s"), 1).over(wSeg).isNull)
      .join(base, "doc_id")
    val gaps = withText
      .select(col("doc_id"), col("gap_s").as("o"),
        col("_t").substr(col("gap_s").cast("int"),
          (col("s") - col("gap_s")).cast("int")).as("piece"))
    val tails = withText.filter(col("is_last"))
      .select(col("doc_id"), col("e").as("o"),
        col("_t").substr(col("e").cast("int"),
          (col("_len") - col("e") + 1).cast("int")).as("piece"))
    val rebuilt = gaps.unionByName(tails)
      .groupBy(col("doc_id"))
      .agg(array_join(expr("transform(array_sort(collect_list(struct(o, piece))), x -> x.piece)"),
        "").as("kept"))
    base.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_len").cast("long").as("n_chars"),
        (col("_len") - length(coalesce(col("kept"), col("_t")))).cast("long")
          .as("removed_chars"),
        md5(coalesce(col("kept"), col("_t"))).as("kept_md5"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidates
    * bucketed by 16-bit chunk equality (pigeonhole: dist ≤ 3 ⇒ some chunk
    * equal). Same crawl-scale guards as [[minhashPairs]]: identical
    * 64-bit signatures collapse to one representative before the chunk
    * join (a byte-identical cluster contributes one row per chunk, and
    * its member pairs — all distance 0 — emit once each from a
    * signature equi-join), and a (chunk, value) bucket holding more
    * than `maxChunkFreq` DISTINCT signatures stops generating pairs
    * (recall contract: distinct signatures differ somewhere, so capped
    * docs normally still meet in another, sparser chunk; identical docs
    * are never affected). Distance computes per signature PAIR before
    * member expansion — never per member pair. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxChunkFreq: Int = 1024): DataFrame = {
    val member = simhash(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash").as("sig"))
    val (memberRid, reps, repPairs) = collapsedRepPairs(member,
      rs => rs.select(col("rid"),
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*)))
        .select(col("rid"), col("pos").as("bk1"), col("col").as("bk2")),
      maxChunkFreq)
    // Hamming distance per signature PAIR — before member expansion
    val scored = repPairs
      .join(reps.select(col("rid").as("ra"), col("sig").as("ha")), Seq("ra"))
      .join(reps.select(col("rid").as("rb"), col("sig").as("hb")), Seq("rb"))
      .select(col("ra"), col("rb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
      .filter(col("dist") <= maxDist)
    withinSigPairs(memberRid).withColumn("dist", lit(0))
      .unionByName(expandRepPairs(memberRid, scored))
      .distinct()
  }

  /** Exact-text collapse shared by the components-oriented dedup APIs:
    * (memberRid (rid, id), repDocs (rid, _t, mult)) where rid = min
    * member id per DISTINCT text and mult = the group size. The text
    * column crosses the shuffle once (same linear cost class as
    * shingling); everything downstream works on distinct texts only. */
  private def textCollapse(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("_t"))
    val reps = base.groupBy(col("_t"))
      .agg(min(col("id")).as("rid"), count(lit(1)).as("mult"))
    val memberRid = base.join(reps, Seq("_t")).select(col("rid"), col("id"))
    (memberRid, reps.select(col("rid"), col("_t"), col("mult")))
  }

  /** Near-dup edge list for [[minhashComponents]] — exposed so tests can
    * pin its SIZE: member→rep star edges (n−1 per n-member identical
    * group) ∪ verified rep-level pairs. A member joins its rep's star
    * only when the rep has ≥ 1 shingle (a shingle-less doc can never
    * appear in the pair graph, so it must not appear here either). */
  private[graft] def minhashComponentEdges(docs: DataFrame, idCol: String,
      textCol: String, threshold: Double, bands: Int, rows: Int,
      maxBandFreq: Int): DataFrame = {
    require(threshold <= 1.0,
      s"star edges assume identical text passes the threshold (got $threshold)")
    val (memberRid, repDocs) = textCollapse(docs, idCol, textCol)
    val pairs = minhashPairs(repDocs, "rid", "_t", threshold, bands, rows,
        maxBandFreq)
      .select(col("ia"), col("ib"))
    val surv = shingles(repDocs, "rid", "_t").select(col("rid")).distinct()
    val star = memberRid.join(surv, Seq("rid"))
      .filter(col("id") =!= col("rid"))
      .select(col("rid").as("ia"), col("id").as("ib"))
    star.unionByName(pairs)
  }

  /** Components-oriented MinHash dedup — near-dup GROUPS without ever
    * materializing member pairs. [[minhashPairs]] expands rep pairs to
    * member pairs, which is quadratic in a true duplicate cluster (a
    * 10⁶-copy crawl page → ~5·10¹¹ pairs) even though candidate
    * GENERATION is linear; when the deliverable is clusters, the
    * expansion is pure waste, because connectedComponents would collapse
    * the pairs right back. This API feeds CC the member→rep star edges
    * (n rows) ∪ verified rep-level pairs instead — identical components
    * (identical text ⇔ jaccard 1 ≥ threshold glues every member to its
    * rep; distinct texts keep their exact verified pair edges, and
    * jaccard over distinct shingle SETS is invariant under text
    * duplication), edges LINEAR in cluster size.
    *
    * Returns (id, comp) — same contract as
    * [[connectedComponents]] over [[minhashPairs]].
    */
  def minhashComponents(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, bands: Int = 16, rows: Int = 4,
      maxBandFreq: Int = 1024): DataFrame =
    connectedComponents(
      minhashComponentEdges(docs, idCol, textCol, threshold, bands, rows,
        maxBandFreq), "ia", "ib")

  /** [[minhashComponents]]'s exact-Jaccard sibling, with the
    * [[jaccardPairs]] stop-shingle cap replicated BIT-EXACTLY on the
    * collapsed corpus: document frequency is the member-weighted sum
    * over distinct texts (a shingle in 150 copies of one page still
    * counts 150), so the surviving-shingle space — and therefore every
    * pair's jaccard and the survivor set — is identical to the
    * uncollapsed computation. An identical group whose every shingle is
    * capped away drops out of the star too, exactly as its members drop
    * out of the pair graph. */
  def jaccardComponents(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5,
      maxDocFreq: Option[Int] = Some(Dedup.DefaultDocFreqCap)): DataFrame =
    connectedComponents(
      jaccardComponentEdges(docs, idCol, textCol, threshold, maxDocFreq),
      "ia", "ib")

  /** Edge list for [[jaccardComponents]] — exposed for the size tests. */
  private[graft] def jaccardComponentEdges(docs: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      maxDocFreq: Option[Int]): DataFrame = {
    require(threshold <= 1.0,
      s"star edges assume identical text passes the threshold (got $threshold)")
    val (memberRid, repDocs) = textCollapse(docs, idCol, textCol)
    val sh0 = shingles(repDocs, "rid", "_t")
    val sh = maxDocFreq match {
      case Some(cap) =>
        // full-corpus document frequency from the collapsed index: one
        // posting row per distinct text, weighted by group size
        val hot = sh0.join(repDocs.select(col("rid"), col("mult")), Seq("rid"))
          .groupBy(col("s")).agg(sum(col("mult")).as("df"))
          .filter(col("df") > cap).select(col("s"))
        sh0.join(broadcast(hot), Seq("s"), "left_anti")
      case None => sh0
    }
    val cnt = sh.groupBy(col("rid").as("id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.select(col("rid").as("ia"), col("s"))
      .join(sh.select(col("rid").as("ib"), col("s")), Seq("s"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
      .join(cnt.withColumnRenamed("id", "ia").withColumnRenamed("n_sh", "na"), Seq("ia"))
      .join(cnt.withColumnRenamed("id", "ib").withColumnRenamed("n_sh", "nb"), Seq("ib"))
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")) >= threshold)
      .select(col("ia"), col("ib"))
    val star = memberRid.join(sh.select(col("rid")).distinct(), Seq("rid"))
      .filter(col("id") =!= col("rid"))
      .select(col("rid").as("ia"), col("id").as("ib"))
    star.unionByName(pairs)
  }

  /** Components-oriented SimHash dedup — [[minhashComponents]]' sibling
    * on the Hamming-distance generator, completing the crawl-scale
    * clustering path for all three pair generators. Identical text ⇒
    * identical signature ⇒ distance 0, so the SIGNATURE collapse's
    * member→rep star edges (n−1 rows per n-member identical-signature
    * group) glue every member to its rep, and rep-level Hamming-verified
    * pairs connect distinct signatures; CC over (star ∪ rep pairs)
    * equals CC over the full [[simhashPairs]] member-pair graph — the
    * within-signature pair expansion and the member expansion of a rep
    * pair both collapse back to exactly these edges — with edge count
    * LINEAR in cluster size instead of quadratic. Returns (id, comp). */
  def simhashComponents(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxChunkFreq: Int = 1024): DataFrame =
    connectedComponents(
      simhashComponentEdges(docs, idCol, textCol, maxDist, maxChunkFreq),
      "ia", "ib")

  /** Edge list for [[simhashComponents]] — exposed so tests can pin its
    * SIZE: member→sig-rep star edges ∪ Hamming-≤`maxDist` rep pairs. */
  private[graft] def simhashComponentEdges(docs: DataFrame, idCol: String,
      textCol: String, maxDist: Int, maxChunkFreq: Int): DataFrame = {
    val member = simhash(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash").as("sig"))
    val (memberRid, reps, repPairs) = collapsedRepPairs(member,
      rs => rs.select(col("rid"),
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*)))
        .select(col("rid"), col("pos").as("bk1"), col("col").as("bk2")),
      maxChunkFreq)
    val scored = repPairs
      .join(reps.select(col("rid").as("ra"), col("sig").as("ha")), Seq("ra"))
      .join(reps.select(col("rid").as("rb"), col("sig").as("hb")), Seq("rb"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxDist)
      .select(col("ra").as("ia"), col("rb").as("ib"))
    val star = memberRid.filter(col("id") =!= col("rid"))
      .select(col("rid").as("ia"), col("id").as("ib"))
    star.unionByName(scored)
  }

  /** DETERMINISTIC audit of the [[simhashPairs]] dense-bucket cap: one
    * row (capped_buckets, capped_sig_rows) counting the (chunk, value)
    * buckets holding more than `maxChunkFreq` DISTINCT signatures — the
    * buckets whose cross-signature pairs the cap suppresses — and the
    * signature rows inside them. Complements the inline observation
    * metric (which a run whose candidate branch collapses to empty
    * under AQE can lose): this is a standalone linear aggregate a
    * pipeline can grade, alert on, or use to pick `maxChunkFreq`. */
  def simhashCapAudit(docs: DataFrame, idCol: String, textCol: String,
      maxChunkFreq: Int = 1024): DataFrame = {
    val member = simhash(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash").as("sig"))
    val reps = member.groupBy(col("sig")).agg(min(col("id")).as("rid"))
    val bands = reps.select(
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("pos").as("bk1"), col("col").as("bk2"))
    bands.groupBy(col("bk1"), col("bk2")).agg(count(lit(1)).as("n"))
      .agg(
        coalesce(sum(when(col("n") > maxChunkFreq, lit(1L))), lit(0L))
          .as("capped_buckets"),
        coalesce(sum(when(col("n") > maxChunkFreq, col("n"))), lit(0L))
          .as("capped_sig_rows"))
  }
}

/** Makes dense-bucket cap hits OBSERVABLE: the `maxFreq` guard in the
  * shared pair scaffolding silently trades recall for boundedness on
  * corpora with boilerplate-dense buckets, so every capped bucket is
  * counted through a `Dataset.observe` metric and logged by a
  * per-session [[org.apache.spark.sql.util.QueryExecutionListener]].
  * The last observation is also kept queryable (for tests and
  * operational assertions) — listener delivery is async, so readers
  * poll [[lastCapped]].
  *
  * Known edge: when the candidate branch materializes EMPTY at runtime
  * (every bucket capped, zero rep pairs), AQE's empty-relation
  * propagation replaces the subtree before the final plan reports
  * metrics, so the observation is lost for exactly that run. The
  * deterministic [[Dedup.simhashCapAudit]] census covers that case —
  * it is a standalone aggregate AQE cannot prune. */
private[graft] object CapObservability {
  import java.util.concurrent.atomic.AtomicLong
  import scala.collection.concurrent.TrieMap

  private val obsId = new AtomicLong()
  // observation id -> (capped_buckets, capped_sig_rows), bounded: old
  // entries are pruned as new ones land
  private val results = TrieMap.empty[Long, (Long, Long)]
  private val Keep = 256L
  // sessions are tracked WEAKLY — a short-lived session must stay
  // collectible once its own listener bus releases it
  private val installed =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  private[llm] def freshName(): String =
    s"graft.dedup.cap.${obsId.incrementAndGet()}"

  /** Snapshot BEFORE running a query whose cap observations you want to
    * read back: [[cappedSince]] with this marker returns only
    * observations generated after it — race-free under concurrent
    * dedup runs (each query's observation carries its own id). */
  def marker(): Long = obsId.get()

  /** Observations with id newer than `marker`, oldest first. */
  def cappedSince(marker: Long): Seq[(Long, Long)] =
    results.toSeq.filter(_._1 > marker).sortBy(_._1).map(_._2)

  /** (capped_buckets, capped_sig_rows) from the newest completed cap
    * observation; None until one completes. Under concurrent runs this
    * is whichever finished last — use [[marker]]/[[cappedSince]] to
    * read a SPECIFIC run's counts. */
  def lastCapped: Option[(Long, Long)] =
    results.toSeq.sortBy(_._1).lastOption.map(_._2)

  def install(spark: SparkSession): Unit = installed.synchronized {
    if (installed.containsKey(spark)) return
    installed.put(spark, java.lang.Boolean.TRUE): Unit
    spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft.dedup.cap.")) {
                val id = name.substring("graft.dedup.cap.".length).toLong
                val buckets = Option(row.get(row.fieldIndex("capped_buckets")))
                  .map(v => math.round(v.asInstanceOf[Double])).getOrElse(0L)
                val rows = Option(row.get(row.fieldIndex("capped_sig_rows")))
                  .map(_.asInstanceOf[Long]).getOrElse(0L)
                results.put(id, (buckets, rows))
                results.keys.filter(_ < id - Keep).foreach(results.remove)
                if (buckets > 0)
                  System.err.println(s"[graft] dedup dense-bucket cap hit: " +
                    s"$buckets bucket(s) / $rows signature row(s) stopped " +
                    "generating cross-signature pairs — recall is reduced " +
                    "for docs whose only shared band/chunk is in a capped " +
                    "bucket (raise maxFreq to trade cost for recall)")
              }
            }
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    ()
  }
}
