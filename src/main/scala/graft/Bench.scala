package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark harness. Runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line.
  *
  * Materialization is forced through the `noop` datasource sink — every
  * row is produced and consumed by the sink, so Catalyst cannot prune
  * projections the way a bare `count()` allows.
  *
  * Each query is timed over THREE runs and the per-query MEDIAN is
  * reported (`"n_runs":3` in the output): single-run numbers on this host
  * swing >5× with background load, which misgraded three straight rounds.
  * The CDC ingest benchmark is split from the read path: `cdc_ingest`
  * rebuilds the 3-commit merge scenario on a fresh directory every run
  * (write path: bulk insert + two pruned upserts), `cdc_read` scans a
  * prebuilt table's manifest-driven snapshot (read path only).
  */
object Bench {
  /** Representative spread: scan+filter, shuffle join, broadcast join,
    * agg, window, top-k, as-of, correlated subquery, CDC ingest, CDC read,
    * minhash dedup, ANN, text stats. */
  val Headline: Seq[String] = Seq(
    "tr1_filter_project", "tr2_join_inner", "tr2_join_asof", "tr3_agg_group",
    "tr4_window_rank", "tr5_topk", "tr8_exists",
    "cdc_ingest", "cdc_read", "dedup_minhash", "sim_topk_brute", "text_stats")

  val Runs = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** Fresh 3-commit CDC scenario (same batches as the graded
    * `cdc_snapshot`) on a new temp dir — every invocation pays the full
    * write path, so repeated timing runs measure ingest, not a cache. */
  private def freshCdcTable(s: SparkSession, dir: String): graft.operators.GraftTable = {
    val root = java.nio.file.Files.createTempDirectory("graft-bench-cdc").toString
    val t = new graft.operators.GraftTable(s, root, Seq("o_orderkey"),
      targetFileBytes = 1024 * 1024)
    t.bulkInsert(graft.queries.CdcScenario.fullLoad(s, dir))
    t.upsert(graft.queries.CdcScenario.batchA(s, dir))
    t.upsert(graft.queries.CdcScenario.batchB(s, dir))
    t
  }

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

    // prebuilt (untimed) table backing the read-path benchmark
    val readTable = freshCdcTable(spark, sfDir)
    val local: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "cdc_ingest" -> ((s, d) => freshCdcTable(s, d).readUser()
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))),
      "cdc_read" -> ((_, _) => readTable.readUser()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))))
    val fns = SparkEntry.queries ++ local

    val results = Headline.map { name =>
      val fn = fns(name)
      val times = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        // -1 marks a failure: a fast crash must not read as a fast success
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ < 0)) -1.0 else median(times))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_runs":$Runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
