package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}
import graft.queries.Q

/** Round-5 scratch probe (dev harness, not graded): measures the empirical
  * agreement between approximate operators and their exact counterparts so
  * the agreement oracles can be designed honestly.
  */
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      println(s"########## $sf")

      // ---- 1. IVF vs brute agreement
      val emb = Q.t(spark, dir, "embeddings")
      val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", col("vec_id") < 20, k = 5)
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", "label", col("vec_id") < 20, k = 5, nprobe = 2)
      val bOnly = brute.exceptAll(ivf).count()
      val iOnly = ivf.exceptAll(brute).count()
      println(s"== ivf_vs_brute: brute_only=$bOnly ivf_only=$iOnly (0/0 = identical)")

      // ---- 2. simhash recall of the jaccard>=0.5 pair set
      val docs = Q.t(spark, dir, "documents")
      val jac = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5, maxDocFreq = Some(100))
        .select(col("ia"), col("ib"), col("jaccard"))
      val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 10)
        .select(col("ia"), col("ib"))
      val jN = jac.count()
      val simN = sim.count()
      val recovered = jac.join(sim, Seq("ia", "ib")).count()
      // distance distribution of the true near-dup pairs under simhash
      val sig = Dedup.simhash(docs, "doc_id", "text")
      val dists = jac
        .join(sig.select(col("doc_id").as("ia"), col("simhash").as("ha")), Seq("ia"))
        .join(sig.select(col("doc_id").as("ib"), col("simhash").as("hb")), Seq("ib"))
        .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
      val dStats = dists.agg(min("d"), max("d"), avg("d")).collect()(0)
      println(s"== simhash: jaccard_pairs=$jN simhash_pairs(d<=10)=$simN recovered=$recovered dist[min=${dStats.get(0)} max=${dStats.get(1)} avg=${dStats.get(2)}]")

      // ---- 3. dedup_cosine top-20: do pairs share the label cell?
      val top = Similarity.cosineTopPairs(emb, "vec_id", "embedding", topN = 20)
      val lab = emb.select(col("vec_id"), col("label"))
      val topLab = top
        .join(lab.select(col("vec_id").as("ia"), col("label").as("la")), Seq("ia"))
        .join(lab.select(col("vec_id").as("ib"), col("label").as("lb")), Seq("ib"))
      val crossCell = topLab.filter(col("la") =!= col("lb")).count()
      val minCos = top.agg(min("cos")).collect()(0).get(0)
      println(s"== cosine_top20: cross_cell_pairs=$crossCell min_cos=$minCos")

      // ---- 4. rolling-hash collision census
      graft.functions.RollingHashFunctions.register(spark)
      val rh = docs.select(col("doc_id"), col("text"),
        graft.functions.RollingHashFunctions.rollingHash(col("text")).as("rh"))
      val census = rh.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_texts"),
        countDistinct(col("rh")).as("n_hashes"),
        countDistinct(col("text"), col("rh")).as("n_pairs")).collect()(0)
      println(s"== rolling_hash: n_docs=${census.get(0)} n_texts=${census.get(1)} n_hashes=${census.get(2)} n_pairs=${census.get(3)}")

      // ---- 5. embeddings shape (for LSH design)
      val nEmb = emb.count()
      val nCells = emb.select(countDistinct(col("label"))).collect()(0).get(0)
      println(s"== embeddings: n=$nEmb cells=$nCells")
    }
    spark.stop()
  }
}
