package graft
import org.apache.spark.sql.SparkSession
import graft.queries.CdcScenario
object ProfDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[prof] $n%-14s ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val root = java.nio.file.Files.createTempDirectory("prof").toString
    val t = new graft.operators.GraftTable(spark, root, Seq("o_orderkey"), targetFileBytes = 1024*1024)
    val fl = time("read fullLoad")(CdcScenario.fullLoad(spark, dir))
    time("bulkInsert")(t.bulkInsert(fl))
    val a = time("read batchA")(CdcScenario.batchA(spark, dir))
    time("upsert A")(t.upsert(a))
    val b = time("read batchB")(CdcScenario.batchB(spark, dir))
    time("upsert B")(t.upsert(b))
    time("agg read")(t.readUser().groupBy("o_orderstatus").count().collect())
    spark.stop()
  }
}
