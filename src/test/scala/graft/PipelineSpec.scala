package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.ConfigLoader
import graft.model.Meta
import graft.pipeline.{IngestJob, Pipeline}
import graft.sources.CdcSource

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeConfig(dir: String, raw: String, curated: String): String = {
    val json =
      s"""[
         |{"config":"pipeline::bulk_insert","identifier":"demo",
         | "raw_root":"$raw","curated_root":"$curated","database":"graft",
         | "step_parallelism":2,"next_pipeline":"delta"},
         |{"config":"pipeline::delta","identifier":"demo",
         | "raw_root":"$raw","curated_root":"$curated","database":"graft",
         | "step_parallelism":2},
         |{"config":"table::public.orders","identifier":"demo","enabled":true,
         | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq",
         |   "is_partitioned":false,
         |   "transformer_sql":"SELECT * FROM <SRC> WHERE o_totalprice >= 0"}},
         |{"config":"table::public.nation","identifier":"demo","enabled":true,
         | "hudi_config":{"record_key":"n_nationkey","source_ordering_field":"trx_seq",
         |   "is_partitioned":false}},
         |{"config":"table::public.ghost","identifier":"demo","enabled":false,
         | "hudi_config":{"record_key":"g_id","source_ordering_field":"trx_seq"}}
         |]""".stripMargin
    val p = Paths.get(dir, "configs.json")
    Files.writeString(p, json)
    p.toString
  }

  private def seedRaw(raw: String): Unit = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("trx_seq", lit("00000000000000000001"))
      .withColumn(Meta.Deleted, lit(false))
    orders.write.mode("overwrite").parquet(s"$raw/public/orders")
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .withColumn("trx_seq", lit("00000000000000000001"))
      .withColumn(Meta.Deleted, lit(false))
    nation.write.mode("overwrite").parquet(s"$raw/public/nation")
  }

  test("config loader parses reference-shaped items") {
    val dir = Files.createTempDirectory("graft-cfg").toString
    val path = writeConfig(dir, "/tmp/raw", "/tmp/cur")
    val cfg = ConfigLoader.load(path, "demo", "bulk_insert")
    assert(cfg.tables.size == 3)
    assert(cfg.enabledTables.map(_.name).toSet == Set("public.orders", "public.nation"))
    assert(cfg.nextPipeline.contains("delta"))
    assert(cfg.tables.find(_.name == "public.orders").get.transformerSql.isDefined)
  }

  test("stats_columns config plumbs through to the table's column-stats index") {
    val base = Files.createTempDirectory("graft-pipe-stats").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val json =
      s"""[
         |{"config":"pipeline::bulk_insert","identifier":"st",
         | "raw_root":"$raw","curated_root":"$curated","database":"graft",
         | "step_parallelism":1},
         |{"config":"table::public.orders","identifier":"st","enabled":true,
         | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq",
         |   "stats_columns":"o_totalprice, o_custkey",
         |   "key_blooms":true, "bloom_columns":"o_custkey",
         |   "partial_update":false}}
         |]""".stripMargin
    val p = Paths.get(base, "configs.json"); Files.writeString(p, json)
    val cfg = ConfigLoader.load(p.toString, "st", "bulk_insert")
    val tc = cfg.tables.head
    assert(tc.statsColumns == Seq("o_totalprice", "o_custkey"))
    assert(tc.keyBlooms && tc.bloomColumns == Seq("o_custkey") && !tc.partialUpdate)
    val report = Pipeline.run(spark, cfg)
    assert(report.ok)
    val table = IngestJob.openTable(spark, cfg, tc)
    val files = table.latestCommit().get.files
    assert(files.nonEmpty)
    assert(files.forall(f => f.colStats.contains("o_totalprice") &&
      f.colStats("o_totalprice").kind == "double"))
    assert(files.forall(f => f.colStats("o_custkey").kind == "long"))
    // bloom config reaches the write path: every file carries both indexes
    assert(files.forall(f => f.keyBloom.isDefined && f.colBlooms.contains("o_custkey")))
  }

  test("bulk_insert -> delta chain: full load, incremental no-op, new-file pickup") {
    val base = Files.createTempDirectory("graft-pipe").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val cfgPath = writeConfig(base, raw, curated)

    // chain: bulk_insert then delta (delta sees no new files -> no_new_data)
    val reports = Pipeline.runChain(spark, cfgPath, "demo", "bulk_insert")
    assert(reports.size == 2)
    assert(reports.head.pipelineType == "bulk_insert" && reports.head.ok)
    assert(reports(1).pipelineType == "delta")
    val deltaStatuses = reports(1).results.map(r => r.table -> r.status).toMap
    assert(deltaStatuses("public.orders") == "no_new_data")
    assert(deltaStatuses("public.ghost") == "skipped")

    // catalog sync (S5): query through the synced name
    val viaCatalog = spark.sql("SELECT count(*) AS n FROM graft_demo_public_orders")
      .as[Long].head()
    val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(viaCatalog == expected)

    // drop a genuinely new CDC file into the raw zone -> delta picks up ONLY it
    Thread.sleep(20)
    val cfg = ConfigLoader.load(cfgPath, "demo", "delta")
    val table = IngestJob.openTable(spark, cfg, cfg.tables.find(_.name == "public.orders").get)
    val wmBefore = table.latestCheckpoint()
    val upd = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(5)
      .withColumn("o_orderstatus", lit("Z"))
      .withColumn("trx_seq", lit("00000000000000000009"))
      .withColumn(Meta.Deleted, lit(false))
    upd.coalesce(1).write.mode("append").parquet(s"$raw/public/orders")

    val report2 = Pipeline.run(spark, cfg)
    assert(report2.ok)
    assert(report2.results.find(_.table == "public.orders").get.status == "ok")
    assert(report2.results.find(_.table == "public.nation").get.status == "no_new_data")
    assert(table.latestCheckpoint() != wmBefore)
    val zCount = table.readUser().filter($"o_orderstatus" === "Z").count()
    assert(zCount == 5)
    assert(table.readUser().count() == expected)

    // idempotent re-run: nothing new
    val report3 = Pipeline.run(spark, cfg)
    assert(report3.results.find(_.table == "public.orders").get.status == "no_new_data")
  }

  test("view_maintain async: the pipeline run itself drains — zero explicit CALLs") {
    val base = Files.createTempDirectory("graft-pipe-async").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val json =
      s"""[
         |{"config":"pipeline::bulk_insert","identifier":"va",
         | "raw_root":"$raw","curated_root":"$curated","database":"graft"},
         |{"config":"pipeline::delta","identifier":"va",
         | "raw_root":"$raw","curated_root":"$curated","database":"graft"},
         |{"config":"table::public.nation","identifier":"va","enabled":true,
         | "hudi_config":{"record_key":"n_nationkey","source_ordering_field":"trx_seq",
         |   "view_maintain":"async"}}
         |]""".stripMargin
    val cfgPath = Paths.get(base, "configs.json"); Files.writeString(cfgPath, json)
    val cfg = ConfigLoader.load(cfgPath.toString, "va", "bulk_insert")
    val tc = cfg.tables.head
    assert(tc.viewMaintain && tc.viewMaintainAsync, "config must parse 'async'")
    assert(Pipeline.run(spark, cfg).ok)
    // register a dependent agg view AFTER the full load
    val table = IngestJob.openTable(spark, cfg, tc)
    val view = graft.operators.IncrementalAgg.create(spark, table,
      s"$base/by_region", Seq("n_regionkey"), Seq("total" -> "n_nationkey"))
    // a CDC wave through the DELTA pipeline: the ingest commit only
    // MARKS (async) — then the run's own post-step drain refreshes the
    // view, so it is fresh with no CALL drain_views anywhere
    Thread.sleep(20)
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").limit(3)
      .withColumn("n_name", lit("REDRAWN"))
      .withColumn("trx_seq", lit("00000000000000000009"))
      .withColumn(Meta.Deleted, lit(false))
      .coalesce(1).write.mode("append").parquet(s"$raw/public/nation")
    val dcfg = ConfigLoader.load(cfgPath.toString, "va", "delta")
    val report = Pipeline.run(spark, dcfg)
    assert(report.ok &&
      report.results.find(_.table == "public.nation").get.status == "ok")
    val head = table.latestCommit().get.seq
    assert(graft.operators.IncrementalAgg.appliedSeq(
      graft.operators.GraftTable.open(spark, view.root)).contains(head),
      "async view must be fresh right after the pipeline run")
    assert(!table.viewsPending(), "the run's drain must clear the pending mark")
    // the standalone drain verb reports and exits 0 (nothing pending)
    assert(graft.Main.drain(spark, cfgPath.toString, "va", "delta") == 0)
  }

  test("failed table is retried then reported; healthy tables still commit") {
    val base = Files.createTempDirectory("graft-pipe-fail").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val json =
      s"""[
         |{"config":"pipeline::bulk_insert","identifier":"demo",
         | "raw_root":"$raw","curated_root":"$curated","retries":1},
         |{"config":"table::public.orders","identifier":"demo",
         | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq"}},
         |{"config":"table::public.nation","identifier":"demo",
         | "hudi_config":{"record_key":"no_such_column","source_ordering_field":"trx_seq"}}
         |]""".stripMargin
    val cfgPath = Paths.get(base, "configs.json")
    Files.writeString(cfgPath, json)
    val cfg = ConfigLoader.load(cfgPath.toString, "demo", "bulk_insert")
    val report = Pipeline.run(spark, cfg)
    assert(!report.ok)
    val byTable = report.results.map(r => r.table -> r).toMap
    assert(byTable("public.orders").status == "ok")
    assert(byTable("public.nation").status == "failed")
    assert(byTable("public.nation").attempts == 2) // one retry
    // an entirely empty raw zone, by contrast, is a no-op, not a failure
    val emptyJson = json.replace("public.nation", "public.ghostzone")
      .replace("no_such_column", "g_id")
    Files.writeString(cfgPath, emptyJson)
    val cfg2 = ConfigLoader.load(cfgPath.toString, "demo", "bulk_insert")
    val r2 = Pipeline.run(spark, cfg2)
    assert(r2.results.find(_.table == "public.ghostzone").get.status == "no_new_data")
  }

  test("schema evolution flows through a delta run (new column null-padded)") {
    val base = Files.createTempDirectory("graft-pipe-evo").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val cfgPath = writeConfig(base, raw, curated)
    Pipeline.run(spark, ConfigLoader.load(cfgPath, "demo", "bulk_insert"))
    Thread.sleep(20)
    // CDC batch carries a brand-new column
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(3)
      .withColumn("o_channel", lit("web"))
      .withColumn("trx_seq", lit("00000000000000000009"))
      .withColumn(Meta.Deleted, lit(false))
      .coalesce(1).write.mode("append").parquet(s"$raw/public/orders")
    val cfg = ConfigLoader.load(cfgPath, "demo", "delta")
    assert(Pipeline.run(spark, cfg).ok)
    val snap = IngestJob.openTable(spark, cfg, cfg.tables.find(_.name == "public.orders").get)
      .readUser()
    assert(snap.columns.contains("o_channel"))
    assert(snap.filter($"o_channel" === "web").count() == 3)
    assert(snap.filter($"o_channel".isNull).count() == snap.count() - 3)
  }

  test("MERGE_ON_READ table through the config-driven pipeline, inline compaction") {
    val base = Files.createTempDirectory("graft-pipe-mor").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val json =
      s"""[
         |{"config":"pipeline::bulk_insert","identifier":"demo",
         | "raw_root":"$raw","curated_root":"$curated"},
         |{"config":"pipeline::delta","identifier":"demo",
         | "raw_root":"$raw","curated_root":"$curated"},
         |{"config":"table::public.orders","identifier":"demo",
         | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq",
         |   "table_type":"MERGE_ON_READ","compact_every":2}}
         |]""".stripMargin
    val cfgPath = Paths.get(base, "configs.json"); Files.writeString(cfgPath, json)
    Pipeline.run(spark, ConfigLoader.load(cfgPath.toString, "demo", "bulk_insert"))
    val cfg = ConfigLoader.load(cfgPath.toString, "demo", "delta")
    val table = IngestJob.openTable(spark, cfg, cfg.tables.head)
    val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()

    def dropUpdate(seq: String, status: String): Unit = {
      Thread.sleep(20)
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(5)
        .withColumn("o_orderstatus", lit(status))
        .withColumn("trx_seq", lit(seq))
        .withColumn(Meta.Deleted, lit(false))
        .coalesce(1).write.mode("append").parquet(s"$raw/public/orders")
      assert(Pipeline.run(spark, cfg).ok)
    }
    dropUpdate("00000000000000000005", "M1")
    assert(table.latestCommit().get.action == "delta_commit")
    dropUpdate("00000000000000000006", "M2")
    // second delta commit hit compact_every=2 → inline compaction ran
    assert(table.latestCommit().get.action == "compact")
    assert(table.latestCommit().get.logFiles.isEmpty)
    assert(table.readUser().count() == expected)
    assert(table.readUser().filter($"o_orderstatus" === "M2").count() == 5)
  }

  test("per-table spark_conf overrides run in an isolated session") {
    val base = Files.createTempDirectory("graft-pipe-conf").toString
    val raw = s"$base/raw"; val curated = s"$base/curated"
    seedRaw(raw)
    val json =
      s"""[
         |{"config":"pipeline::bulk_insert","identifier":"demo",
         | "raw_root":"$raw","curated_root":"$curated",
         | "spark_conf":{"spark.sql.shuffle.partitions":"2"}},
         |{"config":"table::public.orders","identifier":"demo",
         | "spark_conf":{"spark.sql.autoBroadcastJoinThreshold":"1234"},
         | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq"}}
         |]""".stripMargin
    val cfgPath = Paths.get(base, "configs.json"); Files.writeString(cfgPath, json)
    val cfg = ConfigLoader.load(cfgPath.toString, "demo", "bulk_insert")
    assert(cfg.sparkConf("spark.sql.shuffle.partitions") == "2")
    assert(cfg.tables.head.sparkConf("spark.sql.autoBroadcastJoinThreshold") == "1234")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val report = Pipeline.run(spark, cfg)
    assert(report.ok)
    // parent session untouched; ingest committed through the child session
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    val t = IngestJob.openTable(spark, cfg, cfg.tables.head)
    assert(t.readUser().count() ==
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count())
    // catalog visible across sessions via the global view AND by plain
    // name on the caller's session (S5 contract survives isolation)
    assert(spark.sql("SELECT count(*) FROM global_temp.graft_demo_public_orders")
      .head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM graft_demo_public_orders")
      .head().getLong(0) > 0)

    // a non-settable (static) conf fails ONLY that table, not the run
    val badJson = json.replace(
      """"spark_conf":{"spark.sql.autoBroadcastJoinThreshold":"1234"}""",
      """"spark_conf":{"spark.executor.memory":"2g"}""")
    Files.writeString(cfgPath, badJson)
    val badCfg = ConfigLoader.load(cfgPath.toString, "demo", "bulk_insert")
    val badReport = Pipeline.run(spark, badCfg)
    val r = badReport.results.find(_.table == "public.orders").get
    assert(r.status == "failed" && r.error.isDefined)
  }

  test("raw zone scan recurses into date-partition subdirs (DMS layout)") {
    val dir = Files.createTempDirectory("graft-datedirs").toString
    Seq((1L, "a", "01", false)).toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.parquet(s"$dir/2024/01/01")
    Seq((2L, "b", "01", false)).toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.parquet(s"$dir/2024/01/02")
    assert(CdcSource.readRaw(spark, dir).count() == 2)
    assert(CdcSource.listDataFiles(spark, dir).size == 2)
    val Some((df, _)) = CdcSource.readIncremental(spark, dir, None)
    assert(df.count() == 2)
  }

  test("incremental watermark totally orders files sharing an mtime") {
    val dir = Files.createTempDirectory("graft-wm").toString
    Seq((1L, "a", "01", false)).toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, "b", "01", false)).toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.mode("append").parquet(dir)
    val all = CdcSource.listDataFiles(spark, dir)
    assert(all.size == 2)
    // checkpoint covering only the first file: exactly the second returned
    // even if the mtimes collide
    val ck = CdcSource.encodeWatermark(all.map(_._1).max, Seq(all.head._2))
    val Some((df, wm2)) = CdcSource.readIncremental(spark, dir, Some(ck))
    assert(df.count() == 1) // exactly the unprocessed file, never a re-read
    assert(CdcSource.readIncremental(spark, dir, Some(wm2)).isEmpty)

    // a LATE arrival sharing the boundary mtime (path sorts below the
    // processed one) must still be picked up — the same-tick set watermark
    Seq((3L, "late", "01", false)).toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.mode("append").parquet(dir)
    val newFile = CdcSource.listDataFiles(spark, dir).map(_._2)
      .filterNot(p => all.map(_._2).contains(p)).head
    // force the boundary mtime onto the new file
    val (wmM, _) = CdcSource.decodeWatermark(wm2)
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(newFile.stripPrefix("file:")),
      java.nio.file.attribute.FileTime.fromMillis(wmM))
    val Some((df3, wm3)) = CdcSource.readIncremental(spark, dir, Some(wm2))
    assert(df3.count() == 1)
    assert(CdcSource.readIncremental(spark, dir, Some(wm3)).isEmpty)
  }

  test("cross-batch equal trx_seq resolves deterministically: later commit wins") {
    import graft.operators.GraftTable
    val root = Files.createTempDirectory("graft-tiebreak").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    // constant injected ordering (the full-load-only zone case)
    val seq0 = "0" * 20
    t.bulkInsert(Seq((1L, "v1", seq0, false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    t.upsert(Seq((1L, "v2", seq0, false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(t.readUser().select("v").as[String].head() == "v2")
    t.upsert(Seq((1L, "v3", seq0, false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(t.readUser().select("v").as[String].head() == "v3")

    // MOR path: same determinism through the log merge
    val mor = new GraftTable(spark, Files.createTempDirectory("graft-tiemor").toString,
      Seq("id"), targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead)
    mor.bulkInsert(Seq((1L, "m1", seq0, false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    mor.upsert(Seq((1L, "m2", seq0, false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    mor.upsert(Seq((1L, "m3", seq0, false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(mor.readUser().select("v").as[String].head() == "m3")
  }
}
