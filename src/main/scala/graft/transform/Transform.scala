package graft.transform

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TR0 — the transformer hook. The reference's entire relational surface is
  * `SqlQueryBasedTransformer` with a `transformer_sql` statement run against
  * the incoming batch registered as view `<SRC>` before the merge
  * (reference: src/lambdas/launch_hudi/handler.py:115-116,154-155;
  * docs/config_table.md:87-88). Spark-native: register the batch as a
  * unique temp view, substitute the placeholder, let Catalyst plan the
  * statement — every optimizer rewrite (pushdown, pruning, join reorder,
  * decorrelation) applies to the user's SQL for free.
  */
object Transform {
  val SrcPlaceholder = "<SRC>"

  /** Run `sqlText` against `batch` exposed as `<SRC>`. */
  def sql(spark: SparkSession, batch: DataFrame, sqlText: String): DataFrame = {
    val view = s"graft_src_${UUID.randomUUID().toString.replace("-", "")}"
    batch.createOrReplaceTempView(view)
    try spark.sql(sqlText.replace(SrcPlaceholder, view))
    finally spark.catalog.dropTempView(view)
  }

  /** Chain of transformers applied left to right (reference allows any
    * `transformer_class` list — handler.py:154-155). */
  def pipeline(spark: SparkSession, batch: DataFrame, sqls: Seq[String]): DataFrame =
    sqls.foldLeft(batch)((df, s) => sql(spark, df, s))
}
