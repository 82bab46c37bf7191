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

  /** Embedding-cosine near-dup: the most-similar vector pairs (or all
    * pairs ≥ a threshold). This is the exact all-pairs baseline — at
    * corpus scale the candidate set comes from [[ivfTopK]]-style cell
    * bucketing or hyperplane LSH instead of the quadratic join. */
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

  /** IVF-bucketed ANN: centroids from a grouping column (here the coarse
    * quantizer is pre-assigned; at scale it comes from a k-means pass),
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
}
