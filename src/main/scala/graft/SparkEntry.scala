package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the graded operator inventory: one entry per implemented
  * operator from SURVEY.md §2 (TR* relational surface, CDC merge engine,
  * streaming-window semantics, LLM-pipeline operators). `oracleSql` holds
  * the DuckDB-equivalent SQL per query; names and column aliases match
  * exactly (the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * orders-per-nation revenue through a 3-way join with broadcast dim. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("tr2_join_inner")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CdcQueries.queries ++ LlmQueries.queries ++
      PipelineQueries.queries ++ OpsQueries.queries

  def oracleSql: Map[String, String] =
    RelationalOracles.oracles ++ CdcQueries.oracles ++ LlmQueries.oracles ++
      PipelineQueries.oracles ++ OpsQueries.oracles
}
