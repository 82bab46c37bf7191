package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-static enrichment: join a fact stream against a static dimension
  * and maintain running aggregates. The dimension is broadcast to every
  * task of every micro-batch — the stream side never shuffles for the
  * join, which is the only join shape that holds up when the stream is the
  * 100 TB side. Money totals aggregate as DECIMAL (exact, order-free) and
  * only cast to double at the edge, so the result is independent of
  * micro-batch boundaries and task interleaving.
  */
object StreamEnrich {

  /** Drain `factsParquet` through a broadcast join with `dim`, grouping on
    * `dimGroupCol` with count + exact decimal sum of `valueCol`; returns
    * the final aggregates from the complete-mode memory sink. */
  def enrichedStats(spark: SparkSession, factsParquet: String, joinKey: String,
      dim: DataFrame, dimKey: String, dimGroupCol: String, valueCol: String,
      sinkTable: String, filesPerTrigger: Int = 4): DataFrame = {
    val schema = spark.read.parquet(factsParquet).schema
    spark.catalog.dropTempView(sinkTable)
    val streamPath =
      if (new java.io.File(factsParquet).isFile) {
        val f = new java.io.File(factsParquet)
        s"${f.getParent}/{${f.getName}}"
      } else factsParquet
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(streamPath)
      .join(broadcast(dim), col(joinKey) === col(dimKey))
      .groupBy(col(dimGroupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total_dec"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkTable)
      .outputMode("complete")
      .start()
    q.awaitTermination()
    spark.table(sinkTable)
      .select(col(dimGroupCol), col("n"), col("total_dec").cast("double").as("total"))
  }
}
