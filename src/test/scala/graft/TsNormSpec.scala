package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable
import graft.sources.CdcSource
import graft.streaming.ContinuousIngest

/** The round-9 regression class, pinned: a feed whose event-time column
  * arrives as TIMESTAMP_NTZ (`isAdjustedToUTC=false` parquet) or as a
  * raw nanos long must reach the SAME snapshot as the canonical
  * UTC-adjusted feed, through BOTH the batch reader and the streaming
  * ingest path — normalization happens once at the reader boundary
  * ([[graft.util.TsNorm]]), never per-query. */
class TsNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** Canonical fixture: 3 keyed events with microsecond UTC timestamps. */
  private def canonical: DataFrame =
    Seq((1L, 1700000000000000L), (2L, 1700000123456789L), (3L, 1700009999000001L))
      .toDF("id", "us")
      .select($"id", timestamp_micros($"us").as("ts"),
        lit("010").as("trx_seq"), lit(false).as(Meta.Deleted))

  /** Write the three physical encodings of the same rows. */
  private def writeZones(): (String, String, String) = {
    val utc = tmp("tsnorm-utc"); val ntz = tmp("tsnorm-ntz"); val nanos = tmp("tsnorm-nanos")
    canonical.write.mode("overwrite").parquet(utc)
    canonical.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(ntz)
    // Spark cannot WRITE TIMESTAMP(NANOS); under the session's
    // nanosAsLong flag it READS one as a raw long — writing the long
    // directly produces exactly what the reader sees.
    canonical.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(nanos)
    (utc, ntz, nanos)
  }

  test("NTZ and nanos zones read back as TimestampType at the CdcSource boundary") {
    val (utc, ntz, nanos) = writeZones()
    // raw (unnormalized) types differ...
    assert(spark.read.parquet(ntz).schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(nanos).schema("ts").dataType == LongType)
    // ...the boundary reader hands every zone back identical
    val dfs = Seq(utc, ntz, nanos).map(z => CdcSource.readRaw(spark, z))
    dfs.foreach(df => assert(df.schema("ts").dataType == TimestampType))
    val rows = dfs.map(_.select($"id", unix_micros($"ts")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq)
    assert(rows(1) == rows(0) && rows(2) == rows(0))
  }

  test("batch and streaming ingest of NTZ + nanos zones reach the canonical snapshot") {
    val (utc, ntz, nanos) = writeZones()
    def snapshot(t: GraftTable): Seq[(Long, Long)] =
      t.readUser().select($"id", unix_micros($"ts")).as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    // batch path: boundary reader → upsert
    val batchSnaps = Seq(utc, ntz, nanos).map { z =>
      val t = new GraftTable(spark, tmp("tsnorm-b") + "/t", Seq("id"))
      t.upsert(CdcSource.readRaw(spark, z))
      (snapshot(t), t.readUser().schema("ts").dataType)
    }
    // streaming path: file stream → foreachBatch normalize → upsert
    val streamSnaps = Seq(utc, ntz, nanos).map { z =>
      val t = new GraftTable(spark, tmp("tsnorm-s") + "/t", Seq("id"))
      ContinuousIngest.drain(spark, z, t, tmp("tsnorm-ck"))
      (snapshot(t), t.readUser().schema("ts").dataType)
    }
    val want = batchSnaps.head._1
    assert(want.size == 3)
    (batchSnaps ++ streamSnaps).foreach { case (snap, tsType) =>
      assert(snap == want)
      assert(tsType == TimestampType)
    }
  }

  test("text zones keep a long ts column as DATA — the nanos rule is parquet-only") {
    import org.apache.spark.sql.types._
    // a JSONL feed whose schema declares ts as LONG (say epoch millis)
    // can never be parquet TIMESTAMP(NANOS); dividing it by 1000 would
    // silently shift every event — the reader must hand it back verbatim
    val dir = tmp("tsnorm-jsonl")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part0.jsonl"),
      """{"id":1,"ts":1700000000123}""" + "\n" + """{"id":2,"ts":1700000000456}""" + "\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", LongType)))
    val df = CdcSource.readJsonl(spark, dir, schema)
    assert(df.schema("ts").dataType == LongType)
    assert(df.select($"ts").as[Long].collect().sorted.toSeq
      == Seq(1700000000123L, 1700000000456L))
  }

  test("Q.t hands back TimestampType for the graded events table") {
    val ev = graft.queries.Q.t(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // the two operator classes the round-9 regression broke:
    assert(ev.select(unix_micros($"ts")).as[Long].head() > 0L) // DATATYPE_MISMATCH class
    val counted = ev.withWatermark("ts", "1 hour")             // EVENT_TIME class
      .groupBy(window($"ts", "1 day")).count()
    assert(counted.count() > 0L)
  }
}
