package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked STREAM-STREAM interval join — the attribution shape (join
  * clicks to same-user views within a time window) every event pipeline
  * runs. Both sides are unbounded, so Spark must buffer each in the state
  * store and the join condition must bound how long: the equi-key
  * (`user_id`) routes both streams through one hash shuffle, and the
  * time-range predicate plus watermarks bound state eviction — without the
  * range condition state would grow forever on a 100 TB stream.
  *
  * Inner-join rows are emitted as soon as both sides arrive (append mode
  * holds back nothing for inner joins); the watermark delay here is set
  * far above the data's disorder so the drained result is exactly the
  * batch join — the oracle replays it in SQL. Aggregation happens AFTER
  * the sink in batch, keeping a single stateful operator in the stream
  * (the portable shape across Spark versions).
  */
object StreamJoin {

  /** Split `eventsParquet` into a view-stream and a click-stream (sliced
    * into `slices` files each so the join spans several micro-batches and
    * genuinely exercises cross-batch state), interval-join clicks to
    * same-user views within ±`windowMinutes`, drain with AvailableNow,
    * and return per-cohort pair counts + exact integer cent sums.
    */
  def attributionStats(spark: SparkSession, eventsParquet: String,
      sinkTable: String, windowMinutes: Int = 10, slices: Int = 4): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-join")
    val raw = spark.read.parquet(eventsParquet)
    // TIMESTAMP(NANOS) parquet arrives as a raw long under
    // spark.sql.legacy.parquet.nanosAsLong — truncate to micros exactly
    // like the batch loaders (and DuckDB's implicit ns→us read) do
    val events =
      if (raw.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType))
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    def sideDir(tpe: String): String = {
      val d = s"$base/$tpe"
      events.filter(col("event_type") === tpe)
        .repartition(slices).write.mode("overwrite").parquet(d)
      d
    }
    val viewDir = sideDir("view")
    val clickDir = sideDir("click")
    val schema = events.schema
    def stream(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // money as integer cents before any aggregation: double sums are
    // addition-order-dependent across task interleavings, cents are exact
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    val views = stream(viewDir).select(
      col("user_id").as("v_user"), col("ts").as("vts"), cents(col("value")).as("v_cents"))
      .withWatermark("vts", "365 days")
    val clicks = stream(clickDir).select(
      col("user_id").as("c_user"), col("ts").as("cts"), cents(col("value")).as("c_cents"))
      .withWatermark("cts", "365 days")
    val joined = clicks.join(views,
      col("c_user") === col("v_user") &&
        col("vts") >= col("cts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("vts") <= col("cts") + expr(s"INTERVAL $windowMinutes MINUTES"))
    spark.catalog.dropTempView(sinkTable)
    val q = joined.writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
      .groupBy((col("c_user") % 10).as("cohort"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("vts") <= col("cts"), 1L).otherwise(0L)).as("n_view_first"),
        sum(col("c_cents") + col("v_cents")).as("cents_sum"))
  }
}
