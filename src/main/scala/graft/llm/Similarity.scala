package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - [[bruteTopK]]: exact cosine top-k — the correctness baseline. The
  *    query set is broadcast (it is small by construction); cost is
  *    O(|queries| × N) dot products with no shuffle of the big side.
  *  - [[ivfTopK]]: IVF-style coarse quantization — vectors are bucketed by
  *    nearest centroid; a query probes only `nprobe` cells. At 100 TB the
  *    cell assignment is the partition key, so a probe touches a bounded
  *    fraction of data instead of the full corpus.
  *
  * All dot products run inside codegen'd higher-order functions (zip_with /
  * aggregate over the array column) with explicit double casts so results
  * are bit-identical across engines.
  */
object Similarity {

  /** Dot product via the native codegen'd [[graft.functions.FloatVectorDot]]
    * expression — bit-identical to the zip_with/aggregate composable form
    * (same left-to-right double accumulation), one fused loop. */
  private def dot(a: String, b: String) =
    VectorFunctions.floatDot(col(a), col(b))

  private def norm(a: String) = sqrt(dot(a, a))

  /** Exact cosine top-k for each query vector (queries = `queryPred` subset
    * of the corpus, excluded from their own result lists). */
  def bruteTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val q = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", dot("qv", "nv") / (norm("qv") * norm("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-dup: the most-similar vector pairs — the exact
    * all-pairs baseline as a driver-visible NESTED-LOOP join. Spec-side
    * exactness reference ONLY: use [[cosineTopPairsBlocked]] (same result,
    * shuffle-partitioned) on real data, or [[lshCosinePairs]] when a
    * similarity threshold makes sub-quadratic candidates sound. */
  def cosineTopPairs(emb: DataFrame, idCol: String, vecCol: String,
      topN: Int = 20): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val n = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nm", sqrt(VectorFunctions.floatDot(col("v"), col("v"))))
    val a = n.select(col("id").as("ia"), col("v").as("va"), col("nm").as("na"))
    val b = n.select(col("id").as("ib"), col("v").as("vb"), col("nm").as("nb"))
    a.join(b, col("ia") < col("ib"))
      .withColumn("cos", VectorFunctions.floatDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .orderBy(col("cos").desc, col("ia"), col("ib"))
      .limit(topN)
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
  }

  /** Exact global top-N pairs via a BLOCK-PARTITIONED self-join — the
    * distributed shape of exact all-pairs similarity. An exact global
    * top-k over unstructured embeddings is inherently Ω(N²) dot products
    * (no candidate filter can drop a pair without knowing its score); what
    * scale demands is that the N² work be *partitioned and balanced*, not
    * nested-looped. Rows are hashed into `blocks` buckets; each side
    * replicates `blocks`-fold so every (block_a, block_b) cell is a plain
    * equi-join bucket — blocks² independent, uniformly-sized tasks, no
    * BroadcastNestedLoopJoin anywhere, AQE-splittable. Per-partition top-k
    * (TakeOrdered) keeps the result collection O(topN) per task. For
    * threshold-based near-dup at corpus scale use [[lshCosinePairs]]
    * (sub-quadratic candidates) instead of a global top-k.
    */
  def cosineTopPairsBlocked(emb: DataFrame, idCol: String, vecCol: String,
      topN: Int = 20, blocks: Int = 8): DataFrame =
    blockedPairScores(emb, idCol, vecCol, blocks)
      .orderBy(col("cos").desc, col("ia"), col("ib"))
      .limit(topN)
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))

  /** Exact THRESHOLD pairs over the same block-partitioned self-join:
    * every pair with cosine ≥ `threshold`, no global sort — the exact
    * ground-truth side of the LSH recall contract. */
  def cosineThresholdPairsBlocked(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 8): DataFrame =
    blockedPairScores(emb, idCol, vecCol, blocks)
      .filter(col("cos") >= threshold)
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))

  /** Shared block-partitioned exact scorer: (ia, ib, cos) for every
    * unordered pair, as blocks² uniformly-sized equi-join cells (see
    * [[cosineTopPairsBlocked]] for why this is the right Ω(N²) shape). */
  private def blockedPairScores(emb: DataFrame, idCol: String, vecCol: String,
      blocks: Int): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val n = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nm", sqrt(VectorFunctions.floatDot(col("v"), col("v"))))
      .withColumn("blk", pmod(hash(col("id")), lit(blocks)))
    val allBlocks = array((0 until blocks).map(lit): _*)
    val a = n.select(col("id").as("ia"), col("v").as("va"), col("nm").as("na"),
        col("blk").as("ba"))
      .withColumn("bb", explode(allBlocks))
    val b = n.select(col("id").as("ib"), col("v").as("vb"), col("nm").as("nb"),
        col("blk").as("bb"))
      .withColumn("ba", explode(allBlocks))
    a.join(b, Seq("ba", "bb"))                      // hash join on the block cell
      .filter(col("ia") < col("ib"))                // each unordered pair exactly once
      .withColumn("cos", VectorFunctions.floatDot(col("va"), col("vb")) / (col("na") * col("nb")))
  }

  /** Hyperplane-LSH cosine near-dup: pairs with cosine ≥ `threshold`,
    * candidates from sign-signature band equality (random-hyperplane LSH:
    * P[sign equal] = 1 − θ/π), then EXACT re-score of candidates only —
    * the sub-quadratic path for genuine near-dup thresholds (≥ ~0.8).
    * Candidates come from an equi-join on (band, signature): work scales
    * with bucket occupancy, never all-pairs. Recall is probabilistic and
    * tunable: miss probability per true pair is (1 − p^bits)^bands, ~1e-4
    * at cos 0.9 with the defaults. Hyperplanes are seeded-deterministic.
    */
  def lshCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 16, bitsPerBand: Int = 8,
      seed: Long = 42): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val dims = emb.select(size(col(vecCol))).first().getInt(0)
    val rnd = new scala.util.Random(seed)
    // bands × bits Gaussian hyperplanes, fixed by seed (driver-side lits)
    val planes: Array[Array[Array[Double]]] =
      Array.fill(bands, bitsPerBand, dims)(rnd.nextGaussian())
    val n = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nm", sqrt(VectorFunctions.floatDot(col("v"), col("v"))))
    // per band: pack the sign bits into one int signature
    val sigCols = planes.zipWithIndex.map { case (band, bi) =>
      band.zipWithIndex.map { case (h, j) =>
        val dot = expr(
          s"aggregate(zip_with(v, array(${h.mkString(",")}), (x, p) -> CAST(x AS DOUBLE) * p), 0D, (acc, d) -> acc + d)")
        when(dot > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _).as(s"sig$bi")
    }
    val sigs = n.select((Seq(col("id"), col("v"), col("nm")) ++ sigCols): _*)
    val banded = sigs.select(col("id"), col("v"), col("nm"),
      posexplode(array((0 until bands).map(bi => col(s"sig$bi")): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("ia"), col("y.id").as("ib"),
        col("x.v").as("va"), col("x.nm").as("na"),
        col("y.v").as("vb"), col("y.nm").as("nb"))
      .dropDuplicates("ia", "ib")
    cand
      .withColumn("cos", VectorFunctions.floatDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
  }

  /** INT8-quantized brute-force top-k — the scalar-quantization serving
    * shape (faiss SQ8): each vector is symmetrically quantized to
    * `q_i = round(x_i · 127 / max|x|)` (zero vectors quantize to zeros),
    * and candidates are ranked by the INTEGER dot product of the
    * quantized vectors. At serving scale this is the memory-bandwidth
    * win (4× smaller vectors, SIMD int8 dots); here the ranking is
    * all-integer after quantization, so the whole pipeline — including
    * the quantizer itself — replicates exactly in SQL. Ties break to the
    * lower neighbor id. Returns (qid, rnk, nid, qdot).
    */
  def int8TopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5): DataFrame = {
    val quantized = emb
      .withColumn("_amax",
        expr(s"CAST(array_max(transform($vecCol, x -> abs(x))) AS DOUBLE)"))
      .withColumn("_q", expr(
        s"transform($vecCol, x -> IF(_amax = 0D, 0, " +
          "CAST(round(CAST(x AS DOUBLE) * 127D / _amax) AS INT)))"))
    val q = quantized.filter(queryPred)
      .select(col(idCol).as("qid"), col("_q").as("qa"))
    val scored = quantized.select(col(idCol).as("nid"), col("_q").as("qb"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("qdot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> CAST(x AS BIGINT) * y), 0L, (a, b) -> a + b)"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qdot").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), col("qdot"))
  }

  /** Matryoshka-style dimension truncation (MRL serving): rank on only
    * the FIRST `dims` coordinates — with matryoshka-trained embeddings
    * the information-dense prefix carries most of the ranking signal, so
    * halving dims halves memory bandwidth and dot-product work per
    * candidate. Exact same pipeline as [[bruteTopK]] over the sliced
    * vectors (slice is a narrow codegen'd map — no shuffle added), same
    * output shape, so recall against the full-dimension ranking is
    * directly measurable; compose with [[int8RerankTopK]]'s refine for
    * the production truncate→shortlist→exact stack. */
  def truncatedTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5,
      dims: Int = 32): DataFrame =
    bruteTopK(emb.select(col(idCol),
        slice(col(vecCol), 1, dims).as(vecCol)),
      idCol, vecCol, queryPred, k)

  /** Two-stage serving read (the faiss refine / rerank pattern): the
    * INT8 quantized ranking produces a `shortlist`-deep candidate set
    * per query — the memory-bandwidth pass — and exact float cosine then
    * reranks ONLY the shortlisted vectors. At 100 TB the expensive exact
    * scorer touches `|queries| × shortlist` rows instead of the corpus:
    * the shortlist join is a hash equi-join on the candidate id, the
    * query vectors broadcast, and the rerank window is bounded per
    * query. Output shape matches [[bruteTopK]] — (qid, rnk, nid, cos) —
    * so recall against the exact ranking is directly measurable. */
  def int8RerankTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5,
      shortlist: Int = 20): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val short = int8TopK(emb, idCol, vecCol, queryPred, shortlist)
      .select(col("qid"), col("nid"))
    val vecs = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val qs = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val rer = short
      .join(vecs, "nid")
      .join(broadcast(qs), "qid")
      .withColumn("cos", dot("qv", "nv") / (norm("qv") * norm("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    rer.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** Squared-L2 distance between the double arrays in columns `a`/`b` —
    * left-to-right accumulation, bit-identical to DuckDB's list_aggregate
    * over the same zip. */
  private def sqDist(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, d) -> acc + d)")

  /** Coarse-quantizer TRAINING: `iters` Lloyd rounds of k-means over the
    * embedding column, fully deterministic and SQL-replicable so the whole
    * training loop is oracle-checkable:
    *
    *  - init: the `kCells` vectors with the smallest salted md5 of their id
    *    (the same portable salted-hash trick the sampling operators use),
    *    cell number = hash rank;
    *  - assign: nearest centroid by squared L2, ties to the lower cell —
    *    one crossJoin against the BROADCAST k-row centroid table, no
    *    shuffle of the corpus;
    *  - update: per-cell per-dimension mean — one hash aggregate.
    *
    * Per round the 100 TB corpus is touched exactly twice (assign map +
    * partial/final agg); only k×dims doubles ever reach the driver. A cell
    * that attracts no vectors drops out (standard Lloyd behavior, same on
    * both engines). Returns (cell, cv: array<double>).
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      kCells: Int, iters: Int, salt: String = "km", dimsHint: Int = 0): DataFrame = {
    require(kCells >= 1 && iters >= 0, s"need kCells >= 1, iters >= 0")
    // dimsHint skips the probe job when the caller already knows the
    // width (pqTopK calls this m times with a fixed sub-vector size).
    // CONTRACT: the hint must equal the true vector width — a wider hint
    // would silently null-pad the centroid arrays (element_at past the
    // end is null), corrupting every distance downstream
    val dims =
      if (dimsHint > 0) dimsHint
      else emb.select(size(col(vecCol))).first().getInt(0)
    val base = emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    val wSeed = Window.orderBy(col("h"), col("id"))
    var cent: DataFrame = base
      .withColumn("h", md5(concat(lit(s"$salt:"), col("id").cast("string"))))
      .orderBy(col("h"), col("id")).limit(kCells) // TakeOrdered: k rows to one partition
      .select((row_number().over(wSeed) - 1).as("cell"), col("v").as("cv"))
    (1 to iters).foreach { _ =>
      val assigned = assignCells(base, cent)
        .join(base, Seq("id"))
      cent = assigned.groupBy(col("cell"))
        .agg(array((0 until dims).map(i =>
          avg(element_at(col("v"), i + 1))): _*).as("cv"))
    }
    cent
  }

  /** Nearest trained cell per vector, ties to the lower cell: broadcast
    * the k-row centroid table, argmin via one min_by aggregate. */
  private def assignCells(base: DataFrame, cent: DataFrame): DataFrame =
    base.crossJoin(broadcast(cent))
      .withColumn("d2", sqDist("v", "cv"))
      .groupBy(col("id"))
      .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"))

  /** IVF with a TRAINED coarse quantizer: k-means centroids from
    * [[kmeansCentroids]], every vector assigned to its nearest final
    * centroid, queries probe the `nprobe` nearest centroids and search
    * only those cells — [[ivfTopK]]'s scale shape with the quantizer
    * learned instead of pre-assigned. Cosines are computed from the RAW
    * float vectors (codegen'd [[graft.functions.FloatVectorDot]]), so the
    * graded scores are bit-identical across engines; the fp-sensitive
    * centroid means only rank discrete, well-separated cells.
    */
  def ivfTrainedTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5, nprobe: Int = 2,
      kCells: Int = 4, iters: Int = 3): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val cent = kmeansCentroids(emb, idCol, vecCol, kCells, iters)
    val base = emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    val assigned = assignCells(base, cent) // (id, cell) vs FINAL centroids
    val q = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("qd"))
    val wc = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cell"))
    val probed = q.crossJoin(broadcast(cent))
      .withColumn("cdist", sqDist("qd", "cv"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    // search only the probed cells: route by the trained assignment
    val members = assigned.join(
      emb.select(col(idCol).as("nid"), col(vecCol).as("nv")),
      assigned("id") === col("nid")).select(col("cell"), col("nid"), col("nv"))
    val scored = probed.join(members, Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", dot("qv", "nv") / (norm("qv") * norm("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** PRODUCT-QUANTIZATION top-k (the faiss PQ/ADC shape): each vector is
    * compressed to `m` code bytes — per contiguous subspace, the id of
    * the nearest centroid from a per-subspace k-means codebook — and a
    * query ranks neighbors by the ASYMMETRIC distance sum: its exact
    * per-subspace distances to each codebook centroid, looked up by the
    * neighbor's codes. The 100 TB shape: training reuses
    * [[kmeansCentroids]] (aggregates only), the collected codebooks are
    * m×kCodes×(dims/m) doubles (hundreds of bytes), ENCODING is a pure
    * narrow map of literal-centroid expressions — the corpus is never
    * joined or shuffled — and the search is a broadcast of the query set
    * plus m tiny (queries × kCodes) distance-table joins. Ranking ties
    * break to the lower neighbor id; distances sum in fixed subspace
    * order, so the whole pipeline replicates in SQL.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5, m: Int = 4,
      kCodes: Int = 8, iters: Int = 2): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val dims = emb.select(size(col(vecCol))).first().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    val sub = dims / m
    val base = emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    def sliceSql(vcol: String, j: Int) = s"slice($vcol, ${j * sub + 1}, $sub)"
    // 1) per-subspace codebooks — tiny, collected once
    val codebooks: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { j =>
      kmeansCentroids(base.select(col("id"), expr(sliceSql("v", j)).as("sv")),
          "id", "sv", kCodes, iters, salt = s"pq$j", dimsHint = sub)
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    }
    def dLit(vcol: String, j: Int, cv: Seq[Double]) = expr(
      s"aggregate(zip_with(${sliceSql(vcol, j)}, array(${cv.mkString(",")}), " +
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, d) -> acc + d)")
    // 2) encode: argmin (distance, cell) per subspace as literal-centroid
    // expressions — a narrow map, no join against the corpus
    val encoded = (0 until m).foldLeft(base) { (df, j) =>
      val cands = codebooks(j).map { case (cid, cv) =>
        struct(dLit("v", j, cv).as("d"), lit(cid).as("c"))
      }
      df.withColumn(s"code_$j", array_min(array(cands: _*))("c"))
    }.select((col("id").as("nid") +: (0 until m).map(j => col(s"code_$j"))): _*)
    // 3) per-query ADC tables: exact subspace distance to every centroid
    val q = emb.filter(queryPred).select(col(idCol).as("qid"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("qv"))
    val qdists: Seq[DataFrame] = (0 until m).map { j =>
      val entries = codebooks(j).map { case (cid, cv) =>
        struct(lit(cid).as("c"), dLit("qv", j, cv).as("d"))
      }
      q.select(col("qid"), explode(array(entries: _*)).as("e"))
        .select(col("qid"), col("e.c").as(s"code_$j"), col("e.d").as(s"d_$j"))
    }
    // 4) rank by the looked-up distance sum (fixed subspace order)
    val pairs = encoded.crossJoin(broadcast(q.select(col("qid"))))
      .filter(col("nid") =!= col("qid"))
    val withD = (0 until m).foldLeft(pairs) { (df, j) =>
      df.join(broadcast(qdists(j)), Seq("qid", s"code_$j"))
    }
    val adistExpr = (1 until m).foldLeft(col("d_0")) { (acc, j) => acc + col(s"d_$j") }
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("nid"))
    withD.withColumn("adist", adistExpr)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("adist"), 4).as("adist"))
  }

  /** IVF-bucketed ANN: centroids from a grouping column (the pre-assigned
    * quantizer variant; [[ivfTrainedTopK]] is the k-means-trained path),
    * queries probe the `nprobe` nearest centroids, search only those cells.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int = 5, nprobe: Int = 2): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val dims = emb.select(size(col(vecCol))).first().getInt(0)
    val centroids = emb.groupBy(col(cellCol).as("cell"))
      .agg(array((0 until dims).map(i =>
        avg(element_at(col(vecCol), i + 1))): _*).as("cv"))
    val q = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    // pick nprobe closest centroids per query (centroid set is tiny)
    val wc = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cell"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        expr("aggregate(zip_with(qv, cv, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (acc, v) -> acc + v)"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    // search only the probed cells: equi-join on the cell key
    val scored = probed.join(
        emb.select(col(idCol).as("nid"), col(vecCol).as("nv"), col(cellCol).as("cell")),
        Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", dot("qv", "nv") / (norm("qv") * norm("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space with the SQL-replicable [[kmeansCentroids]] trainer,
    * then WITHIN each cluster drop every vector that has a lower-id
    * neighbor at cosine ≥ `threshold` — semantic near-duplicate pruning
    * without an all-pairs join. The 100 TB shape: the trained cells bound
    * pair candidates exactly the way LSH bands do (pair generation is an
    * equi-join on the broadcast-assigned cell id), cosines come from the
    * RAW float vectors (codegen'd dot — bit-identical across engines),
    * and cross-cluster duplicates are missed BY DESIGN, the paper's own
    * documented trade. Returns one row per cell with the member count,
    * drop count and dropped-id checksum — the exact drop SET is graded,
    * not just a tally.
    *
    * '''Cell-size contract (100 TB):''' the within-cell pair join is
    * quadratic in the LARGEST cell, so `kCells` must scale with the
    * corpus: pick `kCells ≈ corpusSize / targetCellSize` with a target
    * cell of ~10⁴–10⁵ vectors (the paper's production runs use 10k–100k
    * clusters over billions of embeddings). The default `kCells = 4` is
    * FIXTURE-scale only. The asymmetry: PRECISION is exact at any
    * `kCells` (a drop only ever fires on a true cos ≥ threshold pair),
    * while RECALL degrades as cells multiply — near-duplicates that land
    * in different cells are missed, the paper's documented trade — so
    * size for the perf bound and accept the recall slope; under-sharding
    * is instead a quadratic perf cliff. LlmSpec pins both halves at
    * kCells ≫ the default.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, kCells: Int = 4, iters: Int = 3): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val cent = kmeansCentroids(emb, idCol, vecCol, kCells, iters)
    val base = emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    val members = assignCells(base, cent)
      .join(emb.select(col(idCol).as("id"), col(vecCol).as("fv")), Seq("id"))
    val a = members.select(col("cell"), col("id").as("ia"), col("fv").as("va"))
    val b = members.select(col("cell"), col("id").as("ib"), col("fv").as("vb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("ia") < col("ib"))
      .withColumn("cos", dot("va", "vb") / (norm("va") * norm("vb")))
      .filter(col("cos") >= threshold)
      .select(col("cell"), col("ib").as("id")).distinct()
    members.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(dropped.groupBy(col("cell"))
        .agg(count(lit(1)).as("nd"), sum(col("id")).as("ds")), Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("nd"), lit(0L)).as("n_dropped"),
        coalesce(col("ds"), lit(0L)).as("dropped_id_sum"))
  }
}
