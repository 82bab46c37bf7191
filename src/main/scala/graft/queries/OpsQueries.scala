package graft.queries

import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.ConfigLoader
import graft.operators.GraftTable
import graft.pipeline.Pipeline
import graft.sources.JdbcSource
import graft.sync.CatalogSync

/** Graded operational semantics — the orchestration/infrastructure layer
  * that was previously spec-tested but invisible to the driver gate:
  *
  *  - S6 JDBC full-load round trip (the DMS full-load phase,
  *    templates/aws-dms-to-hudi.yaml:295 `full-load-and-cdc`)
  *  - O4 single-writer concurrency guard (handler.py:201-213 refuses to
  *    launch while an execution is RUNNING)
  *  - O5 pipeline chaining over `next_pipeline` (emr1.json:256-296)
  *  - O6/O7 failure routing + one-retry-with-backoff (emr1.json:150-157,
  *    163-245)
  *  - S5 persistent catalog sync (handler.py:78-80 hive-syncs every
  *    commit into Glue so other engines/sessions query by name)
  *
  * Each scenario runs the REAL control plane (no mocks) and emits a small
  * deterministic report graded against a VALUES / SQL oracle.
  */
object OpsScenarios {

  // ---------------------------------------------------------------- S6 JDBC

  private val jdbcCache = TrieMap[String, String]()

  /** Load `nation` into an embedded Derby database once per sfDir; the
    * graded query reads it back through the partitioned JDBC source. */
  def derbyUrl(s: SparkSession, dir: String): String =
    jdbcCache.getOrElseUpdate(dir, {
      val dbDir = Files.createTempDirectory("graft-derby-q").resolve("db")
      val url = s"jdbc:derby:$dbDir;create=true"
      Q.t(s, dir, "nation").write.format("jdbc")
        .option("url", url).option("dbtable", "nation")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        // explicit VARCHAR: the Derby dialect's default CLOB mapping cannot
        // be compared/predicate-pushed
        .option("createTableColumnTypes", "n_name VARCHAR(64)")
        .save()
      url
    })

  /** Separate Derby db for the INCREMENTAL pull scenario (the shared
    * `derbyUrl` db must stay immutable — jdbc_roundtrip's oracle is the
    * original nation table): seed nation, then land 5 "CDC" rows above
    * the watermark via plain JDBC inserts. */
  def derbyIncUrl(s: SparkSession, dir: String): String =
    jdbcCache.getOrElseUpdate(s"inc:$dir", {
      val dbDir = Files.createTempDirectory("graft-derby-inc").resolve("db")
      val url = s"jdbc:derby:$dbDir;create=true"
      Q.t(s, dir, "nation").write.format("jdbc")
        .option("url", url).option("dbtable", "nation")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", "n_name VARCHAR(64)")
        .save()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        (0 until 5).foreach { i =>
          st.executeUpdate(s"INSERT INTO nation VALUES " +
            s"(${1000 + i}, 'NEW_$i', ${i % 5})")
        }
        st.close()
      } finally conn.close()
      url
    })

  // ---------------------------------------------------------------- O4 lock

  /** Gate for the lock race, keyed by table root; the winner's batch
    * blocks ONCE inside a filter UDF (same JVM in local mode) so the
    * loser's attempt deterministically overlaps the held lock, then flips
    * to pass-through so remaining rows/tasks cost nothing. */
  final class LockGate {
    val inWrite = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var released = false
  }
  val lockGates = new ConcurrentHashMap[String, LockGate]()

  private val lockCache = TrieMap[String, (Long, Boolean)]()

  /** Two writers race one table: the winner acquires the lock and is held
    * mid-write; the loser's upsert must fail fast with the lock error;
    * after release the winner's commit lands. Both batches are fully
    * constructed BEFORE the race: building a DataFrame can itself run a
    * Spark job (parquet schema merge), which must not compete for task
    * slots while the winner's gated tasks hold them. Returns
    * (commits on the timeline, loser saw the lock failure). */
  def lockRace(s: SparkSession, dir: String): (Long, Boolean) =
    lockCache.getOrElseUpdate(dir, {
      val root = Files.createTempDirectory("graft-lock-q").toString
      val writer1 = new GraftTable(s, root, Seq("o_orderkey"),
        targetFileBytes = 4 * 1024 * 1024)
      val writer2 = new GraftTable(s, root, Seq("o_orderkey"),
        targetFileBytes = 4 * 1024 * 1024)
      val full = CdcScenario.fullLoad(s, dir)
      writer1.bulkInsert(full)
      // small single-partition racing batches, built before the race starts
      val winnerBatch = CdcScenario.batchA(s, dir).limit(500).coalesce(1)
      val loserBatch = CdcScenario.batchB(s, dir).limit(500).coalesce(1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      loserBatch.count() // materialize: the loser must not need cluster slots

      val gate = new LockGate
      lockGates.put(root, gate)
      s.udf.register("graft_lock_gate", (r: String) => {
        val g = lockGates.get(r)
        if (g != null && !g.released) {
          g.inWrite.countDown()
          g.release.await(120, TimeUnit.SECONDS)
          g.released = true
        }
        true
      })

      @volatile var winnerErr: Option[Throwable] = None
      val winner = new Thread(() => {
        try writer1.upsert(winnerBatch.filter(expr(s"graft_lock_gate('$root')")))
        catch { case e: Throwable => winnerErr = Some(e) }
      }, "graft-lock-race-winner")
      winner.start()
      gate.inWrite.await(120, TimeUnit.SECONDS) // winner inside its write, lock held
      var loserFailed = false
      try writer2.upsert(loserBatch)
      catch { case _: IllegalStateException => loserFailed = true }
      gate.release.countDown()
      winner.join(300000)
      loserBatch.unpersist(blocking = false)
      winnerErr.foreach(throw _)
      (writer1.history().size.toLong, loserFailed)
    })

  // ---------------------------------------------------------- O5 chain, O6/O7 retry

  private val chainCache = TrieMap[String, Seq[(Long, Long, String, String)]]()

  /** Chained pipelines over `next_pipeline`: chain 1 starts at
    * bulk_insert and hands off to delta (which finds nothing new); after
    * a CDC batch lands, chain 2 starts at delta and commits. Emits
    * (chain, hop, pipeline, status) per table result. */
  def chainRuns(s: SparkSession, dir: String): Seq[(Long, Long, String, String)] =
    chainCache.getOrElseUpdate(dir, {
      val base = Files.createTempDirectory("graft-chain-q").toString
      val raw = s"$base/raw"
      val cfg =
        s"""[
           |{"config":"pipeline::bulk_insert","identifier":"pchain",
           | "raw_root":"$raw","curated_root":"$base/curated","database":"graft",
           | "next_pipeline":"delta"},
           |{"config":"pipeline::delta","identifier":"pchain",
           | "raw_root":"$raw","curated_root":"$base/curated","database":"graft"},
           |{"config":"table::public.orders","identifier":"pchain","enabled":true,
           | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq",
           |   "is_partitioned":false}}
           |]""".stripMargin
      val cfgPath = Paths.get(base, "configs.json")
      Files.writeString(cfgPath, cfg)
      val rawOrders = s"$raw/public/orders"
      CdcScenario.fullLoad(s, dir).write.mode("overwrite").parquet(rawOrders)
      val chain1 = Pipeline.runChain(s, cfgPath.toString, "pchain", "bulk_insert")
      Thread.sleep(25) // distinct mtime so the (mtime, path) watermark advances
      CdcScenario.batchA(s, dir).coalesce(1).write.mode("append").parquet(rawOrders)
      val chain2 = Pipeline.runChain(s, cfgPath.toString, "pchain", "delta")
      (Seq(chain1, chain2).zipWithIndex.flatMap { case (reports, ci) =>
        reports.zipWithIndex.flatMap { case (r, hop) =>
          r.results.map(tr => (ci.toLong, hop.toLong, r.pipelineType, tr.status))
        }
      })
    })

  private val retryCache = TrieMap[String, Seq[(String, String, Long, Boolean)]]()

  /** Failure semantics under the retry wrapper: `public.orders`'s
    * transformer fails exactly once (marker-file UDF) then succeeds —
    * attempts 2, status ok; `public.customer`'s transformer references a
    * missing column and fails every attempt — status failed, attempts
    * retries+1, and the run as a whole reports ok=false. */
  def retryRuns(s: SparkSession, dir: String): Seq[(String, String, Long, Boolean)] =
    retryCache.getOrElseUpdate(dir, {
      val base = Files.createTempDirectory("graft-retry-q").toString
      val raw = s"$base/raw"
      val marker = s"$base/fail-once-marker"
      s.udf.register("graft_fail_once", (m: String) => {
        try { Files.createFile(Paths.get(m)); throw new RuntimeException("induced transient failure") }
        catch { case _: java.nio.file.FileAlreadyExistsException => true }
      })
      val cfg =
        s"""[
           |{"config":"pipeline::delta","identifier":"pretry",
           | "raw_root":"$raw","curated_root":"$base/curated","database":"graft",
           | "step_parallelism":2,"retries":1},
           |{"config":"table::public.orders","identifier":"pretry","enabled":true,
           | "hudi_config":{"record_key":"o_orderkey","source_ordering_field":"trx_seq",
           |   "is_partitioned":false,
           |   "transformer_sql":"SELECT * FROM <SRC> WHERE graft_fail_once('$marker')"}},
           |{"config":"table::public.customer","identifier":"pretry","enabled":true,
           | "hudi_config":{"record_key":"c_custkey","source_ordering_field":"trx_seq",
           |   "is_partitioned":false,
           |   "transformer_sql":"SELECT no_such_column FROM <SRC>"}}
           |]""".stripMargin
      val cfgPath = Paths.get(base, "configs.json")
      Files.writeString(cfgPath, cfg)
      CdcScenario.fullLoad(s, dir).write.mode("overwrite").parquet(s"$raw/public/orders")
      Q.t(s, dir, "customer").write.mode("overwrite").parquet(s"$raw/public/customer")
      val report = Pipeline.run(s, ConfigLoader.load(cfgPath.toString, "pretry", "delta"))
      report.results.sortBy(_.table)
        .map(tr => (tr.table, tr.status, tr.attempts.toLong, report.ok))
    })

  // ---------------------------------------------------------- O8 CLI exits

  private val cliCache = TrieMap[String, (Long, Long)]()

  /** The scheduler-facing contract (O8): `graft.Main` exits 0 when every
    * chained run is ok and 1 when any table fails permanently. Runs the
    * actual CLI body (`Main.run` — chain, report printing, exit-code
    * decision) in-process on a healthy and a poisoned config. */
  def cliExits(s: SparkSession, dir: String): (Long, Long) =
    cliCache.getOrElseUpdate(dir, {
      val base = Files.createTempDirectory("graft-cli-q").toString
      def cfg(name: String, tableJson: String): String = {
        val p = Paths.get(base, s"$name.json")
        Files.writeString(p,
          s"""[
             |{"config":"pipeline::delta","identifier":"pcli",
             | "raw_root":"$base/raw","curated_root":"$base/curated-$name",
             | "database":"graft","retries":0},
             |$tableJson
             |]""".stripMargin)
        p.toString
      }
      CdcScenario.fullLoad(s, dir).write.mode("overwrite")
        .parquet(s"$base/raw/public/orders")
      val good = cfg("good",
        s"""{"config":"table::public.orders","identifier":"pcli","enabled":true,
           | "hudi_config":{"record_key":"o_orderkey",
           |   "source_ordering_field":"trx_seq","is_partitioned":false}}""".stripMargin)
      val bad = cfg("bad",
        s"""{"config":"table::public.orders","identifier":"pcli","enabled":true,
           | "hudi_config":{"record_key":"o_orderkey",
           |   "source_ordering_field":"trx_seq","is_partitioned":false,
           |   "transformer_sql":"SELECT no_such_column FROM <SRC>"}}""".stripMargin)
      (graft.Main.run(s, good, "pcli", "delta").toLong,
        graft.Main.run(s, bad, "pcli", "delta").toLong)
    })

  // ------------------------------------------------------ S5 persistent sync

  private val catalogCache = TrieMap[String, String]()

  /** Persistent catalog entry over the CDC scenario's final snapshot; the
    * graded read happens from a FRESH session that shares only the
    * metastore (no temp views). */
  def persistentTable(s: SparkSession, dir: String): String =
    catalogCache.getOrElseUpdate(dir, {
      val table = CdcScenario.main(s, dir)
      CatalogSync.syncPersistent(s, "graft_meta", "orders_snapshot", table)
    })
}

object OpsQueries {
  import Q._

  val queries: Map[String, Fn] = Map(
    // S6: partitioned JDBC read of the Derby-loaded nation table
    "jdbc_roundtrip" -> ((s, dir) => {
      val url = OpsScenarios.derbyUrl(s, dir)
      JdbcSource.read(s, url, "nation",
        partitionColumn = Some("n_nationkey"), lowerBound = 0, upperBound = 64,
        numPartitions = 4,
        props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    }),
    // S6b: incremental JDBC pull — only the rows above the watermark come
    // back, with the predicate pushed into the database's own query.
    // The column is passed DIALECT-QUOTED: the query runs verbatim on the
    // source database (Spark's writer created quoted-lowercase columns)
    "jdbc_incremental" -> ((s, dir) => {
      val url = OpsScenarios.derbyIncUrl(s, dir)
      JdbcSource.readIncremental(s, url, "nation", "\"n_nationkey\"",
        lastWatermark = 24,
        props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    }),
    // O4: exactly one of two racing writers commits; the loser records the
    // lock failure
    "lock_guard" -> ((s, dir) => {
      import s.implicits._
      val (nCommits, loserFailed) = OpsScenarios.lockRace(s, dir)
      Seq((nCommits, loserFailed)).toDF("n_commits", "loser_failed")
    }),
    // O5: runChain follows next_pipeline on success and terminates
    "pipeline_chain" -> ((s, dir) => {
      import s.implicits._
      OpsScenarios.chainRuns(s, dir).toDF("chain", "hop", "pipeline", "status")
    }),
    // O6/O7: transient failure retried to success; permanent failure
    // routed into the run report
    "pipeline_failure_retry" -> ((s, dir) => {
      import s.implicits._
      OpsScenarios.retryRuns(s, dir).toDF("table", "status", "attempts", "run_ok")
    }),
    // O8: the CLI exit-code contract, run in-process on a healthy and a
    // poisoned config
    "cli_exit" -> ((s, dir) => {
      import s.implicits._
      val (ok, bad) = OpsScenarios.cliExits(s, dir)
      Seq((ok, bad)).toDF("exit_ok", "exit_failed")
    }),
    // S5: read the synced table BY NAME from a fresh session (shares the
    // metastore, has none of this session's temp views)
    "catalog_persistent" -> ((s, dir) => {
      val name = OpsScenarios.persistentTable(s, dir)
      s.newSession().sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM $name GROUP BY o_orderstatus""")
    })
  )

  val oracles: Map[String, String] = Map(
    "jdbc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // the 5 planted CDC rows and nothing else
    "jdbc_incremental" ->
      """SELECT CAST(1000 + i AS INTEGER) AS n_nationkey,
           'NEW_' || CAST(i AS VARCHAR) AS n_name,
           CAST(i % 5 AS INTEGER) AS n_regionkey
         FROM (SELECT unnest(range(0, 5)) AS i)""",
    "lock_guard" ->
      """SELECT * FROM (VALUES (CAST(2 AS BIGINT), true))
         AS t(n_commits, loser_failed)""",
    "pipeline_chain" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'bulk_insert', 'ok'),
           (CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'delta', 'no_new_data'),
           (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'delta', 'ok'))
         AS t(chain, hop, pipeline, status)""",
    "pipeline_failure_retry" ->
      """SELECT * FROM (VALUES
           ('public.customer', 'failed', CAST(2 AS BIGINT), false),
           ('public.orders', 'ok', CAST(2 AS BIGINT), false))
         AS t("table", status, attempts, run_ok)""",
    "cli_exit" ->
      """SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(1 AS BIGINT)))
         AS t(exit_ok, exit_failed)""",
    "catalog_persistent" -> CdcQueries.statusAggOracle
  )
}
