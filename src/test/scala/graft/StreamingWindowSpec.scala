package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable

/** Event-time windowed aggregation running as an ACTUAL stream (file
  * source → watermark → tumbling window → memory sink), compared against
  * the identical batch computation — the ST-surface check that the
  * st_window_* graded queries run the same operators a stream would.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed tumbling-window counts equal the batch computation") {
    val events = graft.queries.Q.t(spark, "/root/testdata/sf0.001", "events")
      .select($"ts", $"event_type", $"value")
    val dir = Files.createTempDirectory("stream-win").toString
    events.write.mode("overwrite").parquet(dir)

    val batch = events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .as[(Long, String, Long)].collect().toSet

    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("win_out")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("rollback restores an earlier snapshot and reclaims orphaned files") {
    val root = Files.createTempDirectory("graft-rb").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "010", false), (2L, "b", "010", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted))
    t.upsert(Seq((1L, "bad", "020", false), (9L, "junk", "020", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(t.readUser().count() == 3)
    val removed = t.rollback(0L)
    assert(removed == 1)
    val snap = t.readUser().select("id", "v").as[(Long, String)].collect().sorted
    assert(snap.toSeq == Seq((1L, "a"), (2L, "b")))
    // the rolled-back commit's exclusive files are gone from disk
    val referenced = t.history().flatMap(c => (c.files ++ c.logFiles).map(_.path)).toSet
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data")).iterator()
    while (walk.hasNext) {
      val p = walk.next()
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        assert(referenced.contains(java.nio.file.Paths.get(root).relativize(p).toString))
    }
    // table keeps working after rollback
    t.upsert(Seq((3L, "c", "030", false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(t.readUser().count() == 3)
  }

  test("streaming dropDuplicates carries seen-key state across micro-batches") {
    val dir = Files.createTempDirectory("stream-dedup").toString
    // three files with overlapping keys; filesPerTrigger=1 forces three
    // micro-batches, so suppressing the repeats requires cross-batch state
    Seq(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), Seq(4L, 5L, 1L)).zipWithIndex
      .foreach { case (ks, i) =>
        ks.toDF("k").coalesce(1).write.parquet(s"$dir/part$i")
      }
    val got = graft.streaming.StreamDedup
      .distinctKeys(spark, s"$dir/part*", "k", "dedup_spec_sink", filesPerTrigger = 1)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
