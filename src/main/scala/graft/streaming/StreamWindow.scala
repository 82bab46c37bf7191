package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked event-time WINDOW aggregation on a live stream in APPEND
  * mode — the semantics that matter at 100 TB: a window's aggregate is
  * emitted exactly once, when the watermark passes its end, and its state
  * is then dropped. (Complete mode re-emits everything per batch and holds
  * all state forever — fine for a demo, fatal on an unbounded stream.)
  *
  * Determinism contract for the graded drain: with AvailableNow over a
  * fixed file set, the final watermark lands at max(event ts) − delay
  * (the no-data flush batch advances it after the last file), so the
  * emitted set is exactly the windows whose END ≤ that bound — a pure
  * function of the data that the batch oracle recomputes.
  */
object StreamWindow {

  /** Drain `eventsParquet` (sliced into `slices` files → several
    * micro-batches, so the watermark genuinely advances between batches)
    * through a tumbling `windowSpec` count+cents aggregate with
    * `delay` watermark, append mode; returns the emitted (closed)
    * windows. */
  def tumblingStats(spark: SparkSession, eventsParquet: String,
      sinkTable: String, windowSpec: String = "1 hour",
      delay: String = "30 minutes", slices: Int = 4): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-window")
    val raw = spark.read.parquet(eventsParquet)
    val events =
      if (raw.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType))
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // slices must be TIME-CONTIGUOUS and arrive in time order: a batch
    // containing events older than the already-advanced watermark would
    // have them dropped as late (hash-sliced replays lose 3/4 of the
    // data exactly that way). Files are written one at a time with
    // distinct mtimes — the file source processes them oldest-first, so
    // the watermark ratchets forward and nothing is ever late.
    val withM = events.withColumn("_m", expr("unix_micros(ts)"))
    val bounds = withM.stat.approxQuantile("_m",
      (1 until slices).map(_.toDouble / slices).toArray, 0.0).map(_.toLong)
    val inDir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/in"))
    // the file source orders by modification time: stamp each slice with
    // an EXPLICIT, strictly-increasing mtime (seconds apart) — wall-clock
    // sleeps would break on filesystems with coarse mtime granularity and
    // a tie processed out of order drops a whole slice as late data
    val epoch = 1700000000000L
    (0 until slices).foreach { i =>
      val lo: Option[Long] = if (i == 0) None else Some(bounds(i - 1))
      val hi: Option[Long] = if (i == slices - 1) None else Some(bounds(i))
      val part = withM
        .filter(lo.map(col("_m") > lit(_)).getOrElse(lit(true)))
        .filter(hi.map(col("_m") <= lit(_)).getOrElse(lit(true)))
        .drop("_m")
      val stage = s"$base/slice$i"
      part.coalesce(1).write.mode("overwrite").parquet(stage)
      val src = scala.util.Using.resource(
          java.nio.file.Files.list(java.nio.file.Paths.get(stage))) { s =>
        s.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      }
      val dst = inDir.resolve(f"slice$i%03d.parquet")
      java.nio.file.Files.move(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(epoch + i * 2000L))
    }
    spark.catalog.dropTempView(sinkTable)
    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowSpec).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
      .select(unix_timestamp(col("w.start")).as("epoch_s"),
        col("event_type"), col("n"), col("cents"))
  }
}
