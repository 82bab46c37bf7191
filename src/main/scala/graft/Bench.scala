package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness. Runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line.
  *
  * Materialization is forced through the `noop` datasource sink — every
  * row is produced and consumed by the sink, so Catalyst cannot prune
  * projections the way a bare `count()` allows.
  */
object Bench {
  /** Representative spread: scan+filter, shuffle join, broadcast join,
    * agg, window, top-k, as-of, correlated subquery, CDC ingest+merge,
    * minhash dedup, ANN, text stats. */
  val Headline: Seq[String] = Seq(
    "tr1_filter_project", "tr2_join_inner", "tr2_join_asof", "tr3_agg_group",
    "tr4_window_rank", "tr5_topk", "tr8_exists",
    "cdc_snapshot", "dedup_minhash", "sim_topk_brute", "text_stats")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warmup

    val results = Headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // -1 marks a failure: a fast crash must not read as a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
