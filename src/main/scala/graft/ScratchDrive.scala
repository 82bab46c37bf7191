package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Meta
import graft.operators.GraftTable

/** Scratch verification driver: full CDC lifecycle on real testdata. */
object ScratchDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("drive-orders").toString
    println(s"== table root: $root")

    // DMS-style full load of orders (sf0.001) with injected CDC meta cols
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("trx_seq", lit("00000000000000000001"))
      .withColumn(Meta.Deleted, lit(false))
    val t = new GraftTable(spark, root, Seq("o_orderkey"), targetFileBytes = 64 * 1024)
    val c0 = t.bulkInsert(orders)
    println(s"== bulk_insert commit ${c0.seq}: ${c0.files.size} files, ${c0.files.map(_.numRows).sum} rows")

    // CDC batch: update 3 orders, delete 2, insert 1 new, plus an
    // out-of-order duplicate that must lose
    val keys = orders.select("o_orderkey").as[Long].take(6)
    val upd = orders.filter($"o_orderkey".isin(keys.take(3): _*))
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("trx_seq", lit("00000000000000000005"))
      .withColumn(Meta.Deleted, lit(false))
    val del = orders.filter($"o_orderkey".isin(keys.slice(3, 5): _*))
      .withColumn("trx_seq", lit("00000000000000000006"))
      .withColumn(Meta.Deleted, lit(true))
    val ins = orders.limit(1)
      .withColumn("o_orderkey", lit(999999999L))
      .withColumn("trx_seq", lit("00000000000000000007"))
      .withColumn(Meta.Deleted, lit(false))
    val stale = orders.filter($"o_orderkey" === keys(0))
      .withColumn("o_orderstatus", lit("STALE"))
      .withColumn("trx_seq", lit("00000000000000000002")) // lower than the update's 05
      .withColumn(Meta.Deleted, lit(false))
    val batch = upd.union(del).union(ins).union(stale)
    val c1 = t.upsert(batch)
    val carried = c0.files.map(_.path).toSet.intersect(c1.files.map(_.path).toSet)
    println(s"== upsert commit ${c1.seq}: ${c1.files.size} files, carried-forward=${carried.size}")

    val snap = t.readUser()
    val n0 = orders.count(); val n1 = snap.count()
    println(s"== rows: full-load=$n0 snapshot=$n1 (expect ${n0 - 2 + 1})")
    println("== updated rows (expect status X on 3 keys, none STALE):")
    snap.filter($"o_orderkey".isin(keys.take(3): _*)).select("o_orderkey", "o_orderstatus").show()
    println(s"== deleted keys still present (expect 0): " +
      snap.filter($"o_orderkey".isin(keys.slice(3, 5): _*)).count())
    println(s"== inserted key present (expect 1): " +
      snap.filter($"o_orderkey" === 999999999L).count())

    // probe: aggregate over merged snapshot
    snap.groupBy("o_orderstatus").agg(count(lit(1)).as("n"),
      round(sum("o_totalprice"), 2).as("total")).orderBy("o_orderstatus").show()

    // probe: concurrent-writer lock
    try t.withLock { t.withLock { () } ; println("!! nested lock DID NOT throw") }
    catch { case e: IllegalStateException => println(s"== lock probe OK: ${e.getMessage}") }

    // probe: empty upsert batch
    val c2 = t.upsert(batch.limit(0))
    println(s"== empty-batch upsert commit ${c2.seq}, files=${c2.files.size}, rows=${t.read().count()}")

    spark.stop()
  }
}
