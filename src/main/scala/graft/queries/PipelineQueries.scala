package graft.queries

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.ConfigLoader
import graft.pipeline.{Pipeline, RunReport}

/** End-to-end pipeline grading: the CdcScenario batches flow through the
  * REAL control plane — config file → bounded-parallel per-table jobs →
  * incremental checkpointed source → merge → catalog sync — and the final
  * state must equal the same DuckDB oracle as the direct-API scenario.
  * Covers O1-O7, P1-P4, S1, S2, S5 as a single hard signal.
  */
object PipelineScenario {
  private val cache = TrieMap[String, (String, Seq[RunReport])]()

  /** Runs the scenario once per sfDir; returns (catalogViewName, reports). */
  def run(s: SparkSession, dir: String): (String, Seq[RunReport]) =
    cache.getOrElseUpdate(dir, {
      val base = Files.createTempDirectory("graft-pipe-q").toString
      val raw = s"$base/raw"
      val curated = s"$base/curated"
      val cfgJson =
        s"""[
           |{"config":"pipeline::bulk_insert","identifier":"pdemo",
           | "raw_root":"$raw","curated_root":"$curated","database":"graft",
           | "step_parallelism":2},
           |{"config":"pipeline::delta","identifier":"pdemo",
           | "raw_root":"$raw","curated_root":"$curated","database":"graft",
           | "step_parallelism":2},
           |{"config":"table::public.orders","identifier":"pdemo","enabled":true,
           | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq",
           |   "is_partitioned":false}}
           |]""".stripMargin
      val cfgPath = Paths.get(base, "configs.json")
      Files.writeString(cfgPath, cfgJson)

      val rawOrders = s"$raw/public/orders"
      def drop(df: DataFrame): Unit = {
        // distinct mtimes per batch so the (mtime, path) watermark advances
        Thread.sleep(25)
        df.coalesce(1).write.mode("append").parquet(rawOrders)
      }

      CdcScenario.fullLoad(s, dir).write.mode("overwrite").parquet(rawOrders)
      val r0 = Pipeline.run(s, ConfigLoader.load(cfgPath.toString, "pdemo", "bulk_insert"))
      drop(CdcScenario.batchA(s, dir))
      val r1 = Pipeline.run(s, ConfigLoader.load(cfgPath.toString, "pdemo", "delta"))
      drop(CdcScenario.batchB(s, dir))
      val r2 = Pipeline.run(s, ConfigLoader.load(cfgPath.toString, "pdemo", "delta"))
      // one more delta with nothing new: must be a no-op (S2 hard check)
      val r3 = Pipeline.run(s, ConfigLoader.load(cfgPath.toString, "pdemo", "delta"))
      ("graft_pdemo_public_orders", Seq(r0, r1, r2, r3))
    })
}

object PipelineQueries {
  import Q._

  val queries: Map[String, Fn] = Map(
    // the merged result read BY CATALOG NAME (S5) after the full chain
    "pipeline_e2e" -> ((s, dir) => {
      val (view, _) = PipelineScenario.run(s, dir)
      s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM $view GROUP BY o_orderstatus""")
    }),
    // per-run statuses: delta runs commit when files arrive, no-op otherwise
    "pipeline_runs" -> ((s, dir) => {
      import s.implicits._
      val (_, reports) = PipelineScenario.run(s, dir)
      reports.zipWithIndex.flatMap { case (r, i) =>
        r.results.map(tr => (i.toLong, r.pipelineType, tr.table, tr.status))
      }.toDF("run", "pipeline", "table", "status")
    })
  )

  val oracles: Map[String, String] = Map(
    "pipeline_e2e" -> CdcQueries.statusAggOracle,
    "pipeline_runs" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), 'bulk_insert', 'public.orders', 'ok'),
           (CAST(1 AS BIGINT), 'delta', 'public.orders', 'ok'),
           (CAST(2 AS BIGINT), 'delta', 'public.orders', 'ok'),
           (CAST(3 AS BIGINT), 'delta', 'public.orders', 'no_new_data'))
         AS t(run, pipeline, "table", status)"""
  )
}
