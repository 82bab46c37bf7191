package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: times each ops-layer graded query individually. */
object ProbeOps {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("jdbc_roundtrip", "lock_guard", "pipeline_chain",
        "pipeline_failure_retry", "catalog_persistent")) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"== $n: rows=$c ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
