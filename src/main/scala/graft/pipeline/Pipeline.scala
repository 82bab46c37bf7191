package graft.pipeline

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{PipelineConfig, TableConfig}
import graft.model.Meta
import graft.operators.GraftTable
import graft.sources.CdcSource
import graft.sync.CatalogSync
import graft.transform.Transform

/** Outcome of one table's ingest step (O6 failure routing / run report —
  * the Spark-native shape of the step function's per-step result +
  * SNS notification payload, emr1.json:163-245). */
case class TableResult(
    table: String,
    status: String,                  // ok | no_new_data | skipped | failed
    commitSeq: Option[Long],
    rows: Option[Long],
    attempts: Int,
    millis: Long,
    error: Option[String] = None)

case class RunReport(
    identifier: String,
    pipelineType: String,
    results: Seq[TableResult]) {
  def ok: Boolean = results.forall(r => r.status != "failed")
  def toJson: String = {
    val q = graft.util.Json.quote _
    val rs = results.map { r =>
      s"""{"table":${q(r.table)},"status":${q(r.status)},""" +
        s""""commit":${r.commitSeq.getOrElse(-1L)},"rows":${r.rows.getOrElse(-1L)},""" +
        s""""attempts":${r.attempts},"millis":${r.millis}""" +
        r.error.map(e => s""","error":${q(e.take(300))}""").getOrElse("") + "}"
    }.mkString("[", ",", "]")
    s"""{"identifier":${q(identifier)},"pipeline":${q(pipelineType)},"ok":$ok,"results":$rs}"""
  }
}

/** One table's ingest step: raw zone → (transformer) → keyed-table merge →
  * catalog sync. The Spark-native equivalent of a DeltaStreamer
  * spark-submit step (handler.py:125-179).
  */
object IngestJob {

  /** P2/P3 — ensure the injected CDC meta columns exist (the reference's
    * DMS transformation rules add them upstream,
    * aws-dms-to-hudi.yaml:490-522; a full-load-only zone may lack them). */
  private def ensureMeta(df: DataFrame, orderingField: String): DataFrame = {
    val withSeq =
      if (df.columns.contains(orderingField)) df
      else df.withColumn(orderingField, lit("0" * 20))
    if (withSeq.columns.contains(Meta.Deleted)) withSeq
    else withSeq.withColumn(Meta.Deleted, lit(false))
  }

  def openTable(spark: SparkSession, pipe: PipelineConfig, tc: TableConfig): GraftTable =
    new GraftTable(spark, s"${pipe.curatedRoot}/${tc.curatedName(pipe.identifier)}",
      keyFields = tc.recordKey,
      partitionFields = if (tc.isPartitioned) tc.partitionPath else Seq.empty,
      orderingField = tc.sourceOrderingField,
      tableType = tc.tableType,
      compactEvery = if (tc.tableType == GraftTable.MergeOnRead) tc.compactEvery else 0,
      globalIndex = tc.globalIndex,
      statsColumns = tc.statsColumns,
      keyBlooms = tc.keyBlooms,
      bloomColumns = tc.bloomColumns,
      partialUpdate = tc.partialUpdate,
      clusterSmallFileBytes = tc.clusterSmallFileBytes,
      rliMaintain = tc.rliMaintain,
      bucketCount = tc.bucketCount,
      viewMaintain = tc.viewMaintain,
      viewMaintainAsync = tc.viewMaintainAsync)

  def run(spark: SparkSession, pipe: PipelineConfig, tc: TableConfig): TableResult = {
    val t0 = System.currentTimeMillis()
    val table = openTable(spark, pipe, tc)
    val rawDir = s"${pipe.rawRoot}/${tc.rawSubdir}"

    // graft's custom SQL functions are session-scoped: make them available
    // to transformer_sql on whichever session this job runs with
    graft.functions.VectorFunctions.register(spark)
    graft.functions.MinHashFunctions.register(spark)
    graft.functions.RollingHashFunctions.register(spark)

    def ingest(batch0: DataFrame, checkpoint: Option[String]): TableResult = {
      val batch1 = ensureMeta(batch0, tc.sourceOrderingField)
      // TR0 — transformer hook before the merge (handler.py:115-116)
      val batch = tc.transformerSql.fold(batch1)(sql => Transform.sql(spark, batch1, sql))
      val commit = pipe.pipelineType match {
        case "bulk_insert" => table.bulkInsert(batch, checkpoint)
        case _ =>
          val c = table.upsert(batch, checkpoint)
          // T2/T3 maintenance is best-effort: losing the lock race to a
          // concurrent run must not mark THIS run's successful commit as
          // failed — the next cycle cleans/archives instead
          try {
            table.clean(pipe.cleanerCommitsRetained)   // T2 (handler.py:90-91)
            table.archive(pipe.keepTimelineCommits)    // T3 (handler.py:74,92-93)
          } catch { case _: IllegalStateException => () }
          c
      }
      CatalogSync.sync(spark, pipe.database, tc.curatedName(pipe.identifier), table)
      TableResult(tc.name, "ok", Some(commit.seq),
        Some(commit.files.map(_.numRows).sum), 1, System.currentTimeMillis() - t0)
    }

    val result = pipe.pipelineType match {
      case "bulk_insert" =>
        // ONE listing feeds both the load and the checkpoint: listing twice
        // would let a file arriving in between be covered by the watermark
        // yet missing from the data — skipped forever by delta runs
        val files = CdcSource.listDataFiles(spark, rawDir)
        if (files.isEmpty) {
          if (table.latestCommit().isDefined)
            CatalogSync.sync(spark, pipe.database, tc.curatedName(pipe.identifier), table)
          TableResult(tc.name, "no_new_data", table.latestCommit().map(_.seq), None, 1,
            System.currentTimeMillis() - t0)
        } else ingest(
          graft.util.TsNorm.normalize(spark.read.parquet(files.map(_._2): _*)),
          Some(CdcSource.advanceWatermark(None, files)))
      case "delta" =>
        // S2 — consume the commit checkpoint: only files after the watermark
        CdcSource.readIncremental(spark, rawDir, table.latestCheckpoint()) match {
          case None =>
            CatalogSync.sync(spark, pipe.database, tc.curatedName(pipe.identifier), table)
            TableResult(tc.name, "no_new_data", table.latestCommit().map(_.seq),
              table.latestCommit().map(_.files.map(_.numRows).sum), 1,
              System.currentTimeMillis() - t0)
          case Some((df, watermark)) => ingest(df, Some(watermark))
        }
      case "delta_continuous" =>
        // S3/ST2 — continuous loop; in a scheduled context AvailableNow
        // drains the zone and returns (handler.py:166-167 --continuous)
        val ckDir = s"${pipe.curatedRoot}/_checkpoints/${tc.curatedName(pipe.identifier)}"
        val seqBefore = table.latestCommit().map(_.seq)
        graft.streaming.ContinuousIngest.drain(
          spark, rawDir, table, ckDir, tc.transformerSql)
        if (table.latestCommit().isDefined)
          CatalogSync.sync(spark, pipe.database, tc.curatedName(pipe.identifier), table)
        val c = table.latestCommit()
        // "ok" only if the drain actually committed something: the stream
        // checkpoint may already cover every file in the zone
        TableResult(tc.name,
          if (c.map(_.seq) != seqBefore) "ok" else "no_new_data", c.map(_.seq),
          c.map(cc => (cc.files ++ cc.logFiles).map(_.numRows).sum), 1,
          System.currentTimeMillis() - t0)
      case other =>
        throw new IllegalArgumentException(s"pipeline type $other not supported by IngestJob")
    }
    // async view freshness: the reference's contract is a SCHEDULE
    // (aws-dms-to-hudi.yaml:914-927 — the same trigger that launches the
    // ingest), so the run itself drains any pending-views mark after its
    // step — 'view_maintain: async' decouples commit latency from the
    // dependent-view walk without needing a second scheduler or explicit
    // CALL drain_views. Best-effort: a broken view stays consistent-stale
    // (its own watermark recovers at the next drain), never fails the run.
    if (result.status == "ok" && table.viewsPending())
      try { table.drainViews(); () }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] post-ingest view drain failed for " +
          s"${tc.name} (views stay consistent-stale; the next run drains): " +
          e.getMessage)
      }
    result
  }
}

/** O2/O3/O5/O6/O7 — per-table step generation, bounded parallel fan-out
  * (step_parallelism, emr1.json:28,114-161), one retry with backoff
  * (emr1.json:150-157), run report, and pipeline chaining
  * (emr1.json:256-296).
  */
object Pipeline {

  def run(spark: SparkSession, pipe: PipelineConfig): RunReport = {
    val tables = pipe.enabledTables
    val skipped = pipe.tables.filterNot(_.enabled)
      .map(tc => TableResult(tc.name, "skipped", None, None, 0, 0))

    val pool = Executors.newFixedThreadPool(math.max(1, pipe.stepParallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = tables.map { tc =>
      Future {
        // per-table/per-pipeline spark_conf overrides (reference:
        // example-configs.json:83-100 heavy-table executor shapes;
        // docs/config_table.md:90-96): an isolated session shares the
        // SparkContext but carries its own SQL conf, so one table's
        // shuffle sizing never leaks into a sibling job. Runtime confs are
        // inherited from the parent first (newSession starts from the
        // initial conf); graft's custom SQL functions are re-registered by
        // IngestJob on whatever session it runs with. A bad conf (static/
        // core keys are not settable) fails THIS table's result, never the
        // whole run.
        val confs = pipe.sparkConf ++ tc.sparkConf
        var attempt = 0
        var result: TableResult = null
        while (result == null) {
          attempt += 1
          Try {
            val session =
              if (confs.isEmpty) spark
              else {
                val s2 = spark.newSession()
                spark.conf.getAll.foreach { case (k, v) =>
                  try s2.conf.set(k, v) catch { case _: Exception => () }
                }
                confs.foreach { case (k, v) => s2.conf.set(k, v) }
                s2
              }
            IngestJob.run(session, pipe, tc)
          } match {
            case Success(r) => result = r.copy(attempts = attempt)
            case Failure(e) if attempt <= pipe.retries =>
              Thread.sleep(1000L * attempt) // backoff ~1.5x analog (emr1.json:154)
            case Failure(e) =>
              result = TableResult(tc.name, "failed", None, None, attempt, 0,
                Some(e.toString))
          }
        }
        // the caller's session must also see the catalog entry (S5 by-name
        // contract): re-sync on the parent when the job ran isolated
        if (confs.nonEmpty && result.status == "ok")
          Try(CatalogSync.sync(spark, pipe.database, tc.curatedName(pipe.identifier),
            IngestJob.openTable(spark, pipe, tc)))
        result
      }
    }
    val results = try Await.result(Future.sequence(futures), Duration.Inf)
    finally pool.shutdown()
    RunReport(pipe.identifier, pipe.pipelineType, results ++ skipped)
  }

  /** O5 — run a pipeline and, on success, its `next_pipeline` chain
    * (config resolved from the same config file). */
  def runChain(spark: SparkSession, configPath: String, identifier: String,
      pipelineType: String, maxChain: Int = 4): Seq[RunReport] = {
    var reports = Vector.empty[RunReport]
    var next: Option[String] = Some(pipelineType)
    var hops = 0
    while (next.isDefined && hops < maxChain) {
      val cfg = graft.config.ConfigLoader.load(configPath, identifier, next.get)
      val report = run(spark, cfg)
      reports :+= report
      next = if (report.ok) cfg.nextPipeline else None
      hops += 1
    }
    reports
  }
}
