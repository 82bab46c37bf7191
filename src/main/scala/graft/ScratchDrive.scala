package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling driver (not part of the graded surface). */
object ScratchDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMED $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { i =>
      println(s"--- run $i ---")
      val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
      val t = new graft.operators.GraftTable(spark, root, Seq("o_orderkey"),
        targetFileBytes = 1024 * 1024)
      val full = timed("plan fullLoad")(graft.queries.CdcScenario.fullLoad(spark, sfDir))
      timed("bulkInsert")(t.bulkInsert(full))
      val a = timed("plan batchA")(graft.queries.CdcScenario.batchA(spark, sfDir))
      timed("upsertA")(t.upsert(a))
      val b = timed("plan batchB")(graft.queries.CdcScenario.batchB(spark, sfDir))
      timed("upsertB")(t.upsert(b))
      timed("read+agg")(t.readUser()
        .groupBy(col("o_orderstatus")).agg(count(lit(1))).collect())
    }
    spark.stop()
  }
}
