package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.GraftTable
import graft.transform.Transform

/** S3/ST2 — continuous ingest: the Spark-native `--continuous`
  * DeltaStreamer loop (handler.py:166-167). A Structured Streaming file
  * source watches the raw zone; each micro-batch flows through the
  * transformer hook into the keyed-table upsert inside `foreachBatch`.
  *
  * Exactly-once (ST4): the stream's checkpoint pins which files belong to
  * each micro-batch; a replayed batch re-runs the SAME upsert, and
  * latest-wins merge on (key, trx_seq) makes that replay a no-op — commit
  * idempotence at the table layer backstops at-least-once delivery at the
  * stream layer.
  *
  * ST1 micro-batching: `Trigger.AvailableNow` drains everything present
  * and stops (the scheduled-batch analog); a processing-time trigger keeps
  * the loop live like `--continuous`.
  */
object ContinuousIngest {

  def start(spark: SparkSession, rawDir: String, table: GraftTable,
      checkpointDir: String, transformerSql: Option[String] = None,
      availableNow: Boolean = true,
      processingInterval: String = "10 seconds",
      format: String = "parquet",
      sourceSchema: Option[org.apache.spark.sql.types.StructType] = None,
      sourceOptions: Map[String, String] = Map.empty): StreamingQuery = {
    // file streams need an explicit schema: parquet zones probe their own
    // footers once (batch, metadata-only); text formats (json/csv) REQUIRE
    // a caller schema — inference would read every shard before the
    // stream starts
    val schema = sourceSchema.getOrElse {
      require(format == "parquet",
        s"a $format file stream needs an explicit sourceSchema")
      spark.read.option("recursiveFileLookup", "true").parquet(rawDir).schema
    }
    val src = spark.readStream
      .schema(schema)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", 1000)
      .options(sourceOptions)
      .format(format)
      .load(rawDir)
    src.writeStream
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(processingInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // same boundary rule as the batch readers: an NTZ/nanos zone
          // must land in the table as TimestampType; the nanos-long rule
          // is parquet-only (TsNorm scaladoc)
          val norm = graft.util.TsNorm.normalize(batch,
            nanosLong = format == "parquet")
          val b = transformerSql.fold(norm)(sql => Transform.sql(spark, norm, sql))
          table.upsert(b, Some(s"stream-batch-$batchId"))
          ()
        }
      }
      .start()
  }

  /** Sink ANY streaming DataFrame into a keyed table — the programmatic
    * `foreachBatch` twin of `df.writeStream.toTable("graft.t")`
    * ([[GraftStreamingWrite]], the native DSv2 sink): whatever the
    * source (rate, kafka-shaped, a graft catalog stream, a transformed
    * pipeline), each micro-batch upserts under the stream's checkpoint.
    * Both sinks land on the SAME whole-batch write path (precombine →
    * prune → atomic commit) and share its replay contract: a replayed
    * epoch re-runs the same idempotent upsert and latest-wins absorbs
    * it. `foreachBatch` skips the DSv2 staging hop (the batch DataFrame
    * is already whole on the driver) and accepts a `GraftTable` handle
    * directly; `toTable` is the standard surface for catalog-named
    * tables. Composing `spark.readStream.table` with either gives
    * table-to-table streaming through standard surfaces end to end.
    */
  def sink(stream: DataFrame, table: GraftTable, checkpointDir: String,
      availableNow: Boolean = true,
      processingInterval: String = "10 seconds"): StreamingQuery =
    stream.writeStream
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(processingInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          table.upsert(batch, Some(s"stream-sink-$batchId"))
          ()
        }
      }
      .start()

  /** Drain everything currently in the raw zone and stop (one scheduled
    * micro-batch cycle). A quiet/absent zone is the documented no-op
    * cycle, not an error (the schema probe would otherwise throw on an
    * empty directory). Returns true if a drain ran. */
  def drain(spark: SparkSession, rawDir: String, table: GraftTable,
      checkpointDir: String, transformerSql: Option[String] = None,
      format: String = "parquet",
      sourceSchema: Option[org.apache.spark.sql.types.StructType] = None,
      sourceOptions: Map[String, String] = Map.empty): Boolean = {
    // a JSONL zone may shard as .json OR .jsonl (both advertised by
    // CdcSource.readJsonl) — the emptiness probe must accept either, or a
    // .jsonl zone silently never drains while the batch reader ingests it
    val suffixes = format match {
      case "parquet" => Seq(".parquet")
      case "json" => Seq(".json", ".jsonl")
      case other => Seq(s".$other")
    }
    if (suffixes.forall(sfx =>
        graft.sources.CdcSource.listDataFiles(spark, rawDir, sfx).isEmpty)) false
    else {
      val q = start(spark, rawDir, table, checkpointDir, transformerSql,
        availableNow = true, format = format, sourceSchema = sourceSchema,
        sourceOptions = sourceOptions)
      q.awaitTermination()
      true
    }
  }
}
