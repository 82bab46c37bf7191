package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftTable
import graft.sql.GraftSql

/** The SQL doorway: NATIVE VERSION/TIMESTAMP AS OF through the graft
  * DSv2 catalog and the CALL procedure surface (the Hudi Spark-SQL
  * analog). */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-sql").toString

  private def mk(name: String): GraftTable = {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "001"), (2L, "b", "001")).toDF("id", "v", "trx_seq"))
    t.upsert(Seq((2L, "b2", "002"), (3L, "c", "002")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, name, t)
    t
  }

  test("VERSION AS OF resolves natively through the graft catalog") {
    mk("sqlspec_t1")
    val v0 = GraftSql.sql(spark,
      "SELECT id, v FROM graft.sqlspec_t1 VERSION AS OF 0 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(v0 == Seq((1L, "a"), (2L, "b")))
    val v1 = GraftSql.sql(spark,
      "SELECT id, v FROM graft.sqlspec_t1 VERSION AS OF 1 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(v1 == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // live reads: catalog-qualified AND the bare temp-view name
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM graft.sqlspec_t1")
      .as[Long].head() == 3)
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM sqlspec_t1")
      .as[Long].head() == 3)
    // an unregistered name fails in the catalog like any missing table
    intercept[Exception](GraftSql.sql(spark,
      "SELECT * FROM graft.not_registered VERSION AS OF 0"))
  }

  test("TIMESTAMP AS OF resolves through commit times") {
    val t = mk("sqlspec_t2")
    val c0 = t.history().head.commitTimeMs
    // render in UTC explicitly: Spark parses the literal under the
    // session's pinned UTC zone, while java.sql.Timestamp.toString uses
    // the JVM default zone — on a non-UTC JVM they would disagree
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(c0))
    val rows = GraftSql.sql(spark,
      s"SELECT id, v FROM graft.sqlspec_t2 TIMESTAMP AS OF '$ts' ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "b")))
  }

  test("a string literal containing the time-travel phrase is never corrupted") {
    mk("sqlspec_t6")
    // the retired regex doorway would have rewritten the phrase INSIDE
    // this literal; the native catalog path cannot — it's just a string
    val rows = GraftSql.sql(spark,
      """SELECT id, 'sqlspec_t6 VERSION AS OF 0' AS phrase
         FROM graft.sqlspec_t6 VERSION AS OF 1 ORDER BY id""")
      .as[(Long, String)].collect().toSeq
    assert(rows.size == 3)
    assert(rows.forall(_._2 == "sqlspec_t6 VERSION AS OF 0"))
  }

  test("SHOW TABLES IN graft and DESCRIBE resolve through the catalog") {
    mk("sqlspec_t9")
    val names = GraftSql.sql(spark, "SHOW TABLES IN graft")
      .select("tableName").as[String].collect().toSet
    assert(names.contains("sqlspec_t9"))
    val cols = GraftSql.sql(spark, "DESCRIBE TABLE graft.sqlspec_t9")
      .select("col_name").as[String].collect().toSet
    assert(Set("id", "v", "trx_seq").subsetOf(cols))
  }

  test("catalog scans prune columns and apply pushed filters correctly") {
    mk("sqlspec_t8")
    // projection + equality filter: pruned early, residual keeps exactness
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_t8 WHERE id = 2").as[String].collect().toSeq
      == Seq("b2"))
    // zero-column prune path (count-star asks for an empty schema)
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft.sqlspec_t8 WHERE id >= 2")
      .as[Long].head() == 2)
    // pushdown composes with time travel
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_t8 VERSION AS OF 0 WHERE id = 2")
      .as[String].head() == "b")
    // an untranslatable predicate still evaluates (residual-only path)
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_t8 WHERE id % 2 = 1").as[String].collect().toSeq
      == Seq("a", "c"))
  }

  test("catalog pushdown is visible in the executed plan") {
    mk("sqlspec_t10")
    val p = GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_t10 WHERE id = 2")
      .queryExecution.executedPlan.toString
    // the V1 bridge scan must advertise the pushed filter and a schema
    // pruned to the selected column (+ the filter column) — proof the
    // prune/filter reached the snapshot plan instead of post-filtering
    // full rows
    assert(p.contains("PushedFilters"), s"no pushdown marker in:\n$p")
    assert(p.contains("EqualTo(id,2)") || p.contains("IsNotNull(id)"),
      s"id=2 not pushed in:\n$p")
    assert(!p.contains("trx_seq"),
      s"unselected column leaked into the scan schema:\n$p")
  }

  test("catalog SQL point query file-skips through the manifest triage") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 8 * 1024,
      statsColumns = Seq("score"))
    val rows = spark.range(1, 4001)
      .selectExpr("id", "id * 3 AS score", "concat('v', id) AS v",
        "'001' AS trx_seq")
    t.bulkInsert(rows)
    val total = t.latestCommit().get.files.size
    assert(total >= 4, s"fixture must span several files (got $total)")
    GraftSql.register(spark, "sqlspec_prune", t)
    graft.sql.GraftScanMetrics.clear()

    // key point query: O(matching files) admitted, result exact
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_prune WHERE id = 1234").as[String].head()
      == "v1234")
    val (aKey, tKey) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune").get
    assert(tKey == total)
    assert(aKey >= 1 && aKey < total, s"key probe admitted $aKey of $total files")

    // stats-column range: min/max triage admits only overlapping files
    assert(GraftSql.sql(spark,
      """SELECT count(*) AS n FROM graft.sqlspec_prune
         WHERE score >= 300 AND score <= 360""").as[Long].head() == 21)
    val (aStat, _) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune").get
    assert(aStat >= 1 && aStat < total, s"stats range admitted $aStat of $total files")

    // key range prune
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft.sqlspec_prune WHERE id > 3900")
      .as[Long].head() == 100)
    val (aRange, _) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune").get
    assert(aRange >= 1 && aRange < total, s"key range admitted $aRange of $total files")

    // IN-list probe
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft.sqlspec_prune WHERE id IN (5, 3999)")
      .as[Long].head() == 2)
    val (aIn, _) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune").get
    assert(aIn >= 1 && aIn < total, s"IN probe admitted $aIn of $total files")

    // untranslatable predicate: prunes nothing, still exact
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft.sqlspec_prune WHERE id % 1000 = 0")
      .as[Long].head() == 4)
    val (aNone, _) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune").get
    assert(aNone == total, "no translatable conjunct must admit everything")
  }

  test("time-travel catalog scans file-skip against the HISTORICAL manifest") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 8 * 1024)
    t.bulkInsert(spark.range(1, 3001)
      .selectExpr("id", "concat('v', id) AS v", "'001' AS trx_seq"))
    val v0Files = t.latestCommit().get.files.size
    assert(v0Files >= 3)
    // commit 1 rewrites the low keys
    t.upsert(spark.range(1, 101)
      .selectExpr("id", "concat('w', id) AS v", "'002' AS trx_seq"))
    GraftSql.register(spark, "sqlspec_tt_prune", t)
    graft.sql.GraftScanMetrics.clear()
    // point query AS OF commit 0 must admit < v0's files and see v0's value
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_tt_prune VERSION AS OF 0 WHERE id = 50")
      .as[String].head() == "v50")
    val (a0, t0) = graft.sql.GraftScanMetrics
      .lastScan("graft.sqlspec_tt_prune@v0").get
    assert(t0 == v0Files)
    assert(a0 >= 1 && a0 < v0Files, s"time-travel probe admitted $a0 of $v0Files")
    // live query sees the rewrite
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_tt_prune WHERE id = 50").as[String].head() == "w50")
  }

  test("composite-key catalog query prunes when every key field is pinned") {
    val t = new GraftTable(spark, tmp(), Seq("a", "b"), targetFileBytes = 8 * 1024)
    t.bulkInsert(spark.range(1, 3001)
      .selectExpr("id AS a", "concat('x', id % 7) AS b", "concat('v', id) AS v",
        "'001' AS trx_seq"))
    val total = t.latestCommit().get.files.size
    assert(total >= 3)
    GraftSql.register(spark, "sqlspec_prune_ck", t)
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_prune_ck WHERE a = 2026 AND b = 'xий'")
      .as[String].collect().isEmpty) // composite encodes; no such b value
    assert(GraftSql.sql(spark,
      s"SELECT v FROM graft.sqlspec_prune_ck WHERE a = 2026 AND b = 'x${2026 % 7}'")
      .as[String].head() == "v2026")
    val (aCk, tCk) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune_ck").get
    assert(tCk == total)
    assert(aCk >= 1 && aCk < total, s"composite probe admitted $aCk of $total files")
  }

  test("MOR with outstanding logs: key triage prunes, stats triage stands down, result exact") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 8 * 1024,
      tableType = GraftTable.MergeOnRead, statsColumns = Seq("score"))
    t.bulkInsert(spark.range(1, 2001)
      .selectExpr("id", "id * 3 AS score", "concat('v', id) AS v", "'001' AS trx_seq"))
    t.upsert(Seq((7L, 21L, "v7b", "002")).toDF("id", "score", "v", "trx_seq"))
    val c = t.latestCommit().get
    assert(c.logFiles.nonEmpty, "fixture must carry outstanding delta logs")
    GraftSql.register(spark, "sqlspec_prune_mor", t)
    // the updated key resolves to the LOG version — key pruning must keep
    // both the base file holding 7 and the log file superseding it
    assert(GraftSql.sql(spark,
      "SELECT v FROM graft.sqlspec_prune_mor WHERE id = 7").as[String].head()
      == "v7b")
    val (aMor, tMor) = graft.sql.GraftScanMetrics.lastScan("graft.sqlspec_prune_mor").get
    assert(tMor == c.files.size + c.logFiles.size)
    assert(aMor < tMor, s"MOR key probe admitted $aMor of $tMor files")
    // stats triage must NOT prune while logs are outstanding: a log row's
    // latest values are not bounded by base-file stats
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft.sqlspec_prune_mor WHERE score >= 30 AND score <= 60")
      .as[Long].head() == 11)
  }

  test("self-describing tables: open by path, discover through the warehouse conf") {
    val warehouse = Files.createTempDirectory("graft-warehouse").toString
    val t = new GraftTable(spark, s"$warehouse/sales", Seq("id"),
      partitionFields = Seq("region"), targetFileBytes = 16 * 1024,
      statsColumns = Seq("amount"), globalIndex = false)
    t.bulkInsert(Seq((1L, "eu", 10L, "a", "001"), (2L, "us", 20L, "b", "001"))
      .toDF("id", "region", "amount", "v", "trx_seq"))

    // descriptor round-trips the configuration
    val cfg = GraftTable.readConfig(s"$warehouse/sales").get
    assert(cfg.keyFields == Seq("id") && cfg.partitionFields == Seq("region"))
    assert(cfg.statsColumns == Seq("amount") && !cfg.globalIndex)

    // open by path: no constructor configuration
    val reopened = GraftTable.open(spark, s"$warehouse/sales")
    assert(reopened.readUser().count() == 2)
    assert(reopened.partitionFields == Seq("region"))
    reopened.upsert(Seq((3L, "eu", 30L, "c", "002"))
      .toDF("id", "region", "amount", "v", "trx_seq"))
    assert(reopened.readUser().count() == 3)

    // warehouse discovery: graft.<dirname> resolves with NO register call
    GraftSql.install(spark)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    try {
      assert(spark.sql("SELECT count(*) AS n FROM graft.sales").as[Long].head() == 3)
      assert(spark.sql("SELECT v FROM graft.sales WHERE id = 3").as[String].head() == "c")
      val names = spark.sql("SHOW TABLES IN graft")
        .select("tableName").as[String].collect().toSet
      assert(names.contains("sales"))
      // clones are self-describing from commit 0
      val cl = reopened.cloneTo(s"$warehouse/sales_clone")
      assert(cl.readUser().count() == 3)
      assert(spark.sql("SELECT count(*) AS n FROM graft.sales_clone").as[Long].head() == 3)
    } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
    // undescribed directories fail loudly
    intercept[IllegalArgumentException](
      GraftTable.open(spark, Files.createTempDirectory("graft-notatable").toString))
  }

  test("time travel composes with joins and aggregation in one statement") {
    mk("sqlspec_t7")
    // v0 (2 rows) joined to v1 (3 rows) through plain Spark SQL — both
    // sides are independent catalog loads of the SAME table
    val n = GraftSql.sql(spark,
      """SELECT count(*) AS n
         FROM graft.sqlspec_t7 VERSION AS OF 1 a
         JOIN graft.sqlspec_t7 VERSION AS OF 0 b USING (id)""")
      .as[Long].head()
    assert(n == 2)
  }

  test("CALL is first-class in bare spark.sql via the parser extension") {
    mk("sqlspec_ext1")
    val commits = spark.sql("CALL show_commits('sqlspec_ext1')")
      .select("seq", "action").as[(Long, String)].collect().toSeq
    assert(commits == Seq((0L, "bulk_insert"), (1L, "upsert")))
    val changes = spark.sql("CALL show_changes('sqlspec_ext1', 0, 1)")
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(changes == Set((2L, "U"), (3L, "I")))
    // literal safety: a statement CONTAINING the CALL phrase is untouched
    val s = spark.sql(
      "SELECT 'CALL run_clean(sqlspec_ext1, 0)' AS phrase FROM graft.sqlspec_ext1")
      .as[String].collect()
    assert(s.length == 3 && s.forall(_ == "CALL run_clean(sqlspec_ext1, 0)"))
    // malformed CALLs fail loudly through the same grammar
    intercept[IllegalArgumentException](spark.sql("CALL no_such_proc('x')"))
  }

  test("INSERT INTO graft.t upserts; INSERT OVERWRITE replaces the table") {
    val t = mk("sqlspec_ins")
    spark.sql(
      "INSERT INTO graft.sqlspec_ins VALUES (4, 'd', '003'), (2, 'b3', '003')")
    val after = t.readUser().select("id", "v").as[(Long, String)]
      .collect().toMap
    assert(after == Map(1L -> "a", 2L -> "b3", 3L -> "c", 4L -> "d"),
      s"INSERT INTO must upsert (latest-wins on key), got $after")
    // INSERT with a SELECT source through the same path
    spark.sql(
      """INSERT INTO graft.sqlspec_ins
         SELECT id + 10, concat(v, '+'), '004' FROM graft.sqlspec_ins WHERE id = 1""")
    assert(t.readUser().filter($"id" === 11).select("v").as[String].head() == "a+")
    spark.sql("INSERT OVERWRITE graft.sqlspec_ins VALUES (9, 'z', '005')")
    assert(t.readUser().select("id", "v").as[(Long, String)].collect().toSeq
      == Seq((9L, "z")))
    // time-travel still sees the pre-overwrite state
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.sqlspec_ins VERSION AS OF 3").as[Long].head() == 5)
  }

  test("MERGE INTO graft.t translates onto the engine's expression merge") {
    val t = mk("sqlspec_merge")
    Seq((2L, "B", "009"), (9L, "nine", "009"))
      .toDF("id", "v", "trx_seq").createOrReplaceTempView("sqlspec_merge_src")
    val summary = spark.sql(
      """MERGE INTO graft.sqlspec_merge t USING sqlspec_merge_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET v = concat(s.v, '!')
         WHEN NOT MATCHED THEN INSERT *""")
      .as[(String, String)].collect().toMap
    assert(summary("action") == "merge")
    val after = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(after == Map(1L -> "a", 2L -> "B!", 3L -> "c", 9L -> "nine"),
      s"unexpected merged state: $after")

    // conditional DELETE + UPDATE, first-match-wins composition
    Seq((1L, "DEL", "010"), (3L, "KEEP", "010"))
      .toDF("id", "action", "trx_seq").createOrReplaceTempView("sqlspec_merge_src2")
    spark.sql(
      """MERGE INTO graft.sqlspec_merge t USING sqlspec_merge_src2 s
         ON t.id = s.id
         WHEN MATCHED AND s.action = 'DEL' THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = 'touched'""")
    val after2 = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(after2 == Map(2L -> "B!", 3L -> "touched", 9L -> "nine"),
      s"unexpected state after delete-merge: $after2")
  }

  test("multi-clause MERGE applies first-match-wins across N UPDATE/DELETE branches") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq(
      (1L, "a", 10L, "001"), (2L, "b", 200L, "001"), (3L, "c", 300L, "001"),
      (4L, "d", 40L, "001"), (5L, "e", 50L, "001"))
      .toDF("id", "v", "score", "trx_seq"))
    GraftSql.register(spark, "sqlspec_mmulti", t)
    Seq((1L, "DEL"), (2L, "DEL"), (3L, "ADJ"), (4L, "ADJ"))
      .toDF("id", "action").createOrReplaceTempView("sqlspec_mmulti_src")
    // id=2: score>100 claims it FIRST even though action='DEL' — the
    // ordering case; id=1: deleted; id=3: score>100 → 'HI'; id=4: falls
    // to the unconditional tail clause; id=5: unmatched, untouched
    spark.sql(
      """MERGE INTO graft.sqlspec_mmulti t USING sqlspec_mmulti_src s
         ON t.id = s.id
         WHEN MATCHED AND t.score > 100 THEN UPDATE SET
           v = 'HI', score = t.score + 1
         WHEN MATCHED AND s.action = 'DEL' THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = concat(t.v, '+')""")
    val after = t.readUser().select("id", "v", "score")
      .as[(Long, String, Long)].collect()
      .map { case (i, vv, sc) => i -> ((vv, sc)) }.toMap
    assert(after == Map(
      2L -> ("HI", 201L), 3L -> ("HI", 301L),
      4L -> ("d+", 40L), 5L -> ("e", 50L)),
      s"first-match-wins state wrong: $after")

    // swapped clause order flips the ordering case: DELETE claims id=2
    val t2 = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t2.bulkInsert(Seq(
      (1L, "a", 10L, "001"), (2L, "b", 200L, "001"), (3L, "c", 300L, "001"),
      (4L, "d", 40L, "001"), (5L, "e", 50L, "001"))
      .toDF("id", "v", "score", "trx_seq"))
    GraftSql.register(spark, "sqlspec_mmulti2", t2)
    spark.sql(
      """MERGE INTO graft.sqlspec_mmulti2 t USING sqlspec_mmulti_src s
         ON t.id = s.id
         WHEN MATCHED AND s.action = 'DEL' THEN DELETE
         WHEN MATCHED AND t.score > 100 THEN UPDATE SET
           v = 'HI', score = t.score + 1
         WHEN MATCHED THEN UPDATE SET v = concat(t.v, '+')""")
    val after2 = t2.readUser().select("id", "v", "score")
      .as[(Long, String, Long)].collect()
      .map { case (i, vv, sc) => i -> ((vv, sc)) }.toMap
    assert(after2 == Map(
      3L -> ("HI", 301L), 4L -> ("d+", 40L), 5L -> ("e", 50L)),
      s"swapped-order state wrong: $after2")
  }

  test("conditional NOT MATCHED INSERT and NOT MATCHED BY SOURCE clauses") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq(
      (1L, "a", 10L, "001"), (2L, "b", 200L, "001"), (3L, "c", 300L, "001"))
      .toDF("id", "v", "score", "trx_seq"))
    GraftSql.register(spark, "sqlspec_bysrc", t)
    Seq((1L, 5L), (7L, 700L), (8L, 8L))
      .toDF("id", "score").createOrReplaceTempView("sqlspec_bysrc_src")
    // id=1 matched → 'M'; id=7 inserted (cond holds), id=8 NOT inserted;
    // id=3 (no source row, score>250) deleted by the FIRST by-source
    // clause; id=2 falls to the unconditional by-source UPDATE
    spark.sql(
      """MERGE INTO graft.sqlspec_bysrc t USING sqlspec_bysrc_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET v = 'M'
         WHEN NOT MATCHED AND s.score > 100 THEN INSERT (id, score) VALUES (s.id, s.score)
         WHEN NOT MATCHED BY SOURCE AND t.score > 250 THEN DELETE
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(t.v, '-')""")
    val after = t.readUser().select("id", "v", "score")
      .as[(Long, Option[String], Long)].collect()
      .map { case (i, vv, sc) => i -> ((vv, sc)) }.toMap
    assert(after == Map(
      1L -> ((Some("M"), 10L)),
      2L -> ((Some("b-"), 200L)),
      7L -> ((None, 700L))),
      s"by-source merge state wrong: $after")
    // wrong-side references would be NULL on every row the clause can
    // fire on — refused loudly instead of silently never firing
    val e1 = intercept[Exception](spark.sql(
      """MERGE INTO graft.sqlspec_bysrc t USING sqlspec_bysrc_src s
         ON t.id = s.id
         WHEN NOT MATCHED AND t.score > 0 THEN INSERT (id, score) VALUES (s.id, s.score)"""))
    assert(e1.getMessage.contains("may not reference target"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO graft.sqlspec_bysrc t USING sqlspec_bysrc_src s
         ON t.id = s.id
         WHEN NOT MATCHED BY SOURCE AND s.score > 0 THEN DELETE"""))
    assert(e2.getMessage.contains("may not reference source"), e2.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table to the source's columns") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "001"), (2L, "b", "001"), (3L, "c", "001"))
      .toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "sqlspec_evolve", t)
    Seq((2L, "B", "web"), (9L, "nine", "app"))
      .toDF("id", "v", "channel").createOrReplaceTempView("sqlspec_evolve_src")
    // without evolution, assigning the unknown column refuses loudly
    val e = intercept[Exception](spark.sql(
      """MERGE INTO graft.sqlspec_evolve t USING sqlspec_evolve_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET channel = s.channel"""))
    assert(e.getMessage.contains("non-key table columns"), e.getMessage)
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.sqlspec_evolve t
         USING sqlspec_evolve_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val after = t.readUser().select("id", "v", "channel")
      .as[(Long, String, Option[String])].collect()
      .map { case (i, vv, ch) => i -> ((vv, ch)) }.toMap
    assert(after == Map(
      1L -> (("a", None)), 2L -> (("B", Some("web"))),
      3L -> (("c", None)), 9L -> (("nine", Some("app")))),
      s"evolved merge state wrong: $after")
    // the widened column is part of the table schema from now on
    assert(t.readUser().schema.fieldNames.contains("channel"))
  }

  test("matched rows every MERGE clause passes over keep their commit stamp") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", 1L, "001"), (2L, "b", 2L, "001"))
      .toDF("id", "grp", "v", "trx_seq"))
    GraftSql.register(spark, "sqlspec_stamp", t)
    Seq((1L, 100L), (2L, 200L)).toDF("id", "nv")
      .createOrReplaceTempView("sqlspec_stamp_src")
    val before = t.read().select(col("id"), col(graft.model.Meta.CommitSeq))
      .as[(Long, Long)].collect().toMap
    spark.sql(
      """MERGE INTO graft.sqlspec_stamp t USING sqlspec_stamp_src s
         ON t.id = s.id
         WHEN MATCHED AND t.id = 1 THEN UPDATE SET v = s.nv""")
    val after = t.read().select(col("id"), col(graft.model.Meta.CommitSeq))
      .as[(Long, Long)].collect().toMap
    assert(after(1L) > before(1L), "the claimed row must take the new stamp")
    assert(after(2L) == before(2L),
      "a matched row no clause claimed is an unmodified carry and must keep its stamp")
  }

  test("CALL create_agg_view / refresh_agg_view manage a materialized view from SQL") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(Seq((1L, "a", 5L, "001"), (2L, "b", 7L, "001"))
      .toDF("id", "grp", "v", "trx_seq"))
    GraftSql.register(spark, "sqlspec_ivm_src", src)
    val loc = tmp()
    val created = spark.sql("CALL create_agg_view('sqlspec_ivm_src', " +
      s"'sqlspec_ivm_v', '$loc', 'grp', 'v=v*10;lo=min:v;hi=max:v')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(created("bootstrapped_at") == "0")
    src.upsert(Seq((3L, "a", 9L, "002")).toDF("id", "grp", "v", "trx_seq"))
    val refreshed = spark.sql("CALL refresh_agg_view('sqlspec_ivm_v')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(refreshed("from_seq") == "0" && refreshed("to_seq") == "1", refreshed)
    val got = spark.sql(
      "SELECT grp, n, v, lo, hi FROM graft.sqlspec_ivm_v ORDER BY grp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 140L, 5L, 9L), ("b", 1L, 70L, 7L, 7L)), s"got $got")
    // current view: refresh is an idempotent no-op
    val again = spark.sql("CALL refresh_agg_view('sqlspec_ivm_v')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again("from_seq") == "1" && again("to_seq") == "1")
    // a plain table is not a view: refusal names the missing spec
    val e = intercept[Exception](
      spark.sql("CALL refresh_agg_view('sqlspec_ivm_src')").collect())
    assert(e.getMessage.contains("not a created view"), e.getMessage)
    // show_view reports the spec + watermark a refresh would act on
    val sv = spark.sql("CALL show_view('sqlspec_ivm_v')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sv("kind") == "aggregate" && sv("group_cols") == "grp" &&
      sv("applied_seq") == "1", sv)
    intercept[Exception](
      spark.sql("CALL show_view('sqlspec_ivm_src')").collect())
  }

  test("CALL create_join_view / refresh_join_view / show_view manage a join view") {
    val l = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    l.bulkInsert(Seq((1L, 10L, "a", "001"), (2L, 77L, "b", "001"))
      .toDF("id", "fk", "lv", "trx_seq"))
    val r = new GraftTable(spark, tmp(), Seq("fk"), targetFileBytes = 16 * 1024)
    r.bulkInsert(Seq((10L, "ten", "001")).toDF("fk", "dv", "trx_seq"))
    GraftSql.register(spark, "sqlspec_jv_l", l)
    GraftSql.register(spark, "sqlspec_jv_r", r)
    val loc = tmp()
    val created = spark.sql("CALL create_join_view('sqlspec_jv_l', " +
      s"'sqlspec_jv_r', 'sqlspec_jv_v', '$loc', 'fk=fk', 'left')").collect()
      .map(row => row.getString(0) -> row.getString(1)).toMap
    assert(created("bootstrapped_left") == "0" &&
      created("bootstrapped_right") == "0", created)
    // LEFT OUTER: the dangling row is present with a NULL dim column
    val boot = spark.sql(
      "SELECT id, dv FROM graft.sqlspec_jv_v ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq
    assert(boot == Seq((1L, Some("ten")), (2L, None)), s"got $boot")
    r.upsert(Seq((77L, "late", "002")).toDF("fk", "dv", "trx_seq"))
    val refreshed = spark.sql("CALL refresh_join_view('sqlspec_jv_v')")
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(refreshed("left_seq") == "0" && refreshed("right_seq") == "1",
      refreshed)
    val after = spark.sql(
      "SELECT id, dv FROM graft.sqlspec_jv_v ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq
    assert(after == Seq((1L, Some("ten")), (2L, Some("late"))), s"got $after")
    val sv = spark.sql("CALL show_view('sqlspec_jv_v')")
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(sv("kind") == "join" && sv("join_type") == "left" &&
      sv("on") == "fk=fk" && sv("left_seq") == "0" && sv("right_seq") == "1", sv)
    // refresh_join_view refuses a non-join view
    intercept[Exception](
      spark.sql("CALL refresh_join_view('sqlspec_jv_l')").collect())
  }

  test("UPDATE and DELETE statements run as pruned partial rewrites") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 8 * 1024,
      statsColumns = Seq("score"))
    t.bulkInsert(spark.range(1, 4001)
      .selectExpr("id", "id * 3 AS score", "concat('v', id) AS v", "'001' AS trx_seq"))
    val total = t.latestCommit().get.files.size
    assert(total >= 4)
    GraftSql.register(spark, "sqlspec_dml", t)

    // UPDATE with a key-range WHERE: triage rewrites only the tail files
    val u = spark.sql(
      "UPDATE graft.sqlspec_dml SET v = concat(v, '!') WHERE id >= 3900")
      .as[(String, String)].collect().toMap
    assert(u("action") == "update_where")
    assert(u("files_rewritten").toInt >= 1 && u("files_rewritten").toInt < total,
      s"key-range UPDATE must prune the rewrite: $u")
    assert(t.readUser().filter($"v".endsWith("!")).count() == 101)
    assert(t.readUser().filter($"id" === 3950).select("v").as[String].head() == "v3950!")
    assert(t.readUser().filter($"id" === 100).select("v").as[String].head() == "v100")

    // DELETE with a stats-column WHERE: triage prunes via column min/max
    val d = spark.sql(
      "DELETE FROM graft.sqlspec_dml WHERE score >= 300 AND score <= 360")
      .as[(String, String)].collect().toMap
    assert(d("action") == "delete_where")
    assert(d("files_rewritten").toInt < total, s"stats DELETE must prune: $d")
    assert(t.readUser().count() == 4000 - 21)
    assert(t.readUser().filter($"score" === 300).isEmpty)

    // history stays travelable across both rewrites
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.sqlspec_dml VERSION AS OF 0").as[Long].head() == 4000)

    // protected columns refuse; aliases resolve; non-graft passes through
    intercept[IllegalArgumentException](spark.sql(
      "UPDATE graft.sqlspec_dml SET id = 1 WHERE id = 2"))
    assert(spark.sql(
      "UPDATE graft.sqlspec_dml SET v = v WHERE id = -5")
      .as[(String, String)].collect().toMap.apply("files_rewritten") == "0")
    val e = intercept[Exception](spark.sql(
      "DELETE FROM sqlspec_dml WHERE id = 1")) // temp view, not our catalog
    assert(!e.getMessage.startsWith("graft row-level SQL"))
  }

  test("MERGE INTO rejects duplicate source keys and non-key ON conditions") {
    mk("sqlspec_merge_guard")
    Seq((2L, "x", "009"), (2L, "y", "009"))
      .toDF("id", "v", "trx_seq").createOrReplaceTempView("sqlspec_dup_src")
    val dup = intercept[IllegalArgumentException](spark.sql(
      """MERGE INTO graft.sqlspec_merge_guard t USING sqlspec_dup_src s
         ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v"""))
    assert(dup.getMessage.contains("multiple rows"),
      s"duplicate-source-key rejection must survive the SQL path: ${dup.getMessage}")
    // ON not on the record key: loud, not silently wrong
    intercept[IllegalArgumentException](spark.sql(
      """MERGE INTO graft.sqlspec_merge_guard t USING sqlspec_dup_src s
         ON t.v = s.v WHEN MATCHED THEN UPDATE SET v = s.v"""))
    // MERGE on a non-graft target parses through Spark untouched (fails
    // in Spark's analyzer for a plain view, NOT in our translator)
    val e = intercept[Exception](spark.sql(
      """MERGE INTO sqlspec_merge_guard t USING sqlspec_dup_src s
         ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v"""))
    assert(!e.getMessage.startsWith("graft MERGE INTO"))
  }

  test("CALL procedures: show_commits, clean, savepoint/restore, rollback, rli") {
    val t = mk("sqlspec_t3")
    val commits = GraftSql.sql(spark, "CALL show_commits('sqlspec_t3')")
      .select("seq", "action").as[(Long, String)].collect().toSeq
    assert(commits == Seq((0L, "bulk_insert"), (1L, "upsert")))
    // savepoint + junk batch + restore
    GraftSql.sql(spark, "CALL create_savepoint('sqlspec_t3', 1)").collect()
    assert(t.listSavepoints().map(_.seq) == Seq(1L))
    t.upsert(Seq((9L, "junk", "003")).toDF("id", "v", "trx_seq"))
    GraftSql.sql(spark, "CALL restore_savepoint('sqlspec_t3', 1)").collect()
    assert(t.readUser().count() == 3)
    // rollback discards the junk + restore commits
    GraftSql.sql(spark, "CALL rollback_to('sqlspec_t3', 1)").collect()
    assert(t.history().map(_.seq) == Seq(0L, 1L))
    // record index through SQL; stale-free because nothing committed since
    val idx = GraftSql.sql(spark, "CALL build_record_index('sqlspec_t3')")
      .as[(String, String)].collect().toMap
    assert(idx("indexed_seq") == "1")
    // clean retains the latest snapshot
    GraftSql.sql(spark, "CALL run_clean('sqlspec_t3', 1)").collect()
    assert(t.readUser().count() == 3)
  }

  test("CALL run_clustering takes the optional plan threshold") {
    val t = mk("sqlspec_t4")
    val r = GraftSql.sql(spark,
      "CALL run_clustering('sqlspec_t4', 4096)")
      .as[(String, String)].collect().toMap
    // tiny table: either a no-op plan (fewer than 2 small files) or a
    // planned merge — both surface through the summary shape
    assert(r.contains("action") || r.contains("files_rewritten") || r.nonEmpty)
  }

  test("CALL show_table_stats reports the manifest census") {
    val t = mk("sqlspec_stats")
    val stats = spark.sql("CALL show_table_stats('sqlspec_stats')")
      .as[(String, String)].collect().toMap
    assert(stats("seq") == "1" && stats("n_log_files") == "0")
    assert(stats("total_rows").toLong == 3)
    assert(stats("n_files").toInt == t.latestCommit().get.files.size)
    assert(stats("min_key").nonEmpty && stats("max_key").nonEmpty)
  }

  test("CALL show_changes surfaces the change-data-feed between commits") {
    mk("sqlspec_t11")
    // commit 0 = {1->a, 2->b}; commit 1 upserts 2->b2 and inserts 3->c
    val rows = GraftSql.sql(spark, "CALL show_changes('sqlspec_t11', 0, 1)")
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(rows == Set((2L, "U"), (3L, "I")))
  }

  test("CALL run_fsck and show_partitions report off the live manifest") {
    val t = new GraftTable(spark, tmp(), Seq("id"), Seq("p"),
      targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "x", "a", "001"), (2L, "y", "b", "001"),
      (3L, "z", "b", "001")).toDF("id", "v", "p", "trx_seq"))
    GraftSql.register(spark, "sqlspec_fsck", t)
    val verdict = spark.sql("CALL run_fsck('sqlspec_fsck')")
      .as[(String, String)].collect().toMap
    assert(verdict("ok") == "true" && verdict("n_missing") == "0")
    val parts = spark.sql("CALL show_partitions('sqlspec_fsck')")
      .select("partition", "n_rows").as[(String, Long)].collect().toMap
    assert(parts == Map("p=a" -> 1L, "p=b" -> 2L), s"unexpected census: $parts")
  }

  test("unknown procedures and malformed arguments fail loudly") {
    mk("sqlspec_t5")
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL no_such_proc('sqlspec_t5')"))
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL run_clean('sqlspec_t5')")) // arity
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL show_commits('not_registered')"))
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL run_clean('sqlspec_t5', 'unterminated)"))
    // the quoted-literal relaxation is scoped to create_agg_view's
    // free-form positions (measure spec / predicate) — a quoted token
    // outside the strict charset must still be refused everywhere else
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL restore_savepoint('sqlspec_t5; x1()', 1)"))
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL create_agg_view('x1; ()', 'v', 'loc', 'g', 'm=v')"))
  }

  test("CALL dedup-state lifecycle: create, refresh, show, drop from SQL") {
    def sent(a: Int, b: Int): String = (a to b).map(i => s"w$i").mkString(" ")
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, sent(1, 12)), (3L, sent(100, 112))).toDF("id", "text"))
    GraftSql.register(spark, "sqlspec_dd_src", t)
    val loc = tmp() + "/state"
    val created = GraftSql.sql(spark,
      s"CALL create_dedup_state('sqlspec_dd_src', 'sqlspec_dd', '$loc', 'id', 'text')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(created("bootstrapped_at") == "0")
    // wave: 2 near-dups 1 — show_views flags the state STALE until the
    // one CALL catches it up
    t.upsert(Seq((2L, sent(3, 14))).toDF("id", "text"))
    def staleOf(name: String): java.lang.Boolean =
      GraftSql.sql(spark, "CALL show_views()").collect()
        .map(r => r.getAs[String]("view") -> r.getAs[java.lang.Boolean]("stale"))
        .toMap.apply(name)
    assert(staleOf("sqlspec_dd") == java.lang.Boolean.TRUE)
    val out = GraftSql.sql(spark, "CALL refresh_dedup_state('sqlspec_dd')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("from_seq") == "0" && out("to_seq") == "1")
    assert(staleOf("sqlspec_dd") == java.lang.Boolean.FALSE)
    // the clusters read back as PLAIN SQL over the registered state
    val cl = GraftSql.sql(spark,
      """SELECT id, comp FROM graft.sqlspec_dd
         WHERE comp IN (SELECT comp FROM graft.sqlspec_dd
                        GROUP BY comp HAVING COUNT(*) >= 2)
         ORDER BY id""").as[(Long, Long)].collect().toSeq
    assert(cl == Seq((1L, 1L), (2L, 1L)))
    // show_view reports the dedup kind, spec and watermark
    val sv = GraftSql.sql(spark, "CALL show_view('sqlspec_dd')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sv("kind") == "dedup" && sv("applied_seq") == "1" &&
      sv("id_col") == "id" && sv("text_col") == "text")
    // show_views enumerates the materializations, never plain tables
    val lst = GraftSql.sql(spark, "CALL show_views()").collect()
      .map(r => r.getAs[String]("view") -> r.getAs[String]("kind")).toMap
    assert(lst.get("sqlspec_dd").contains("dedup"))
    assert(!lst.contains("sqlspec_dd_src"))
    // refresh refuses a non-state; drop_view refuses a plain table
    val e1 = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL refresh_dedup_state('sqlspec_dd_src')"))
    assert(e1.getMessage.contains("not a created dedup state"))
    val e2 = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL drop_view('sqlspec_dd_src')"))
    assert(e2.getMessage.contains("not a created view"))
    // drop_view retires the state: hands-free registration removed,
    // name deregistered, external-location files kept (DROP TABLE rule)
    assert(t.dependentViews().nonEmpty)
    val dropped = GraftSql.sql(spark, "CALL drop_view('sqlspec_dd')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dropped("kind") == "dedup")
    assert(t.dependentViews().isEmpty)
    intercept[Exception](
      GraftSql.sql(spark, "CALL show_view('sqlspec_dd')"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(loc, "_graft", "table.json")))
  }

  test("CALL segment-state lifecycle: create, refresh, show, drop from SQL") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a b c d e f"), (2L, "a b c x y z")).toDF("id", "text"))
    GraftSql.register(spark, "sqlspec_sg_src", t)
    val loc = tmp() + "/state"
    val created = GraftSql.sql(spark,
      s"CALL create_segment_state('sqlspec_sg_src', 'sqlspec_sg', '$loc', " +
        "'id', 'text', 3)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(created("bootstrapped_at") == "0")
    // wave: d3 duplicates d1's "d e f" — the UNCHANGED partner row moves
    t.upsert(Seq((3L, "d e f q r s")).toDF("id", "text"))
    val out = GraftSql.sql(spark, "CALL refresh_segment_state('sqlspec_sg')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("from_seq") == "0" && out("to_seq") == "1")
    val dups = GraftSql.sql(spark,
      "SELECT id, n_dup_segs FROM graft.sqlspec_sg ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(dups == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    val sv = GraftSql.sql(spark, "CALL show_view('sqlspec_sg')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sv("kind") == "segment" && sv("applied_seq") == "1" &&
      sv("seg_words") == "3")
    val lst = GraftSql.sql(spark, "CALL show_views()").collect()
      .map(r => r.getAs[String]("view") -> r.getAs[String]("kind")).toMap
    assert(lst.get("sqlspec_sg").contains("segment"))
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CALL refresh_segment_state('sqlspec_sg_src')"))
    assert(t.dependentViews().nonEmpty)
    GraftSql.sql(spark, "CALL drop_view('sqlspec_sg')").collect()
    assert(t.dependentViews().isEmpty)
    intercept[Exception](GraftSql.sql(spark, "CALL show_view('sqlspec_sg')"))
  }

  test("CALL drop_view retires agg and join views; show_views tracks the set") {
    val left = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    left.bulkInsert(Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "g", "fk"))
    val right = new GraftTable(spark, tmp(), Seq("fk"), targetFileBytes = 16 * 1024)
    right.bulkInsert(Seq((10L, "d1"), (20L, "d2")).toDF("fk", "rv"))
    GraftSql.register(spark, "sqlspec_dv_l", left)
    GraftSql.register(spark, "sqlspec_dv_r", right)
    val base = tmp()
    GraftSql.sql(spark, "CALL create_agg_view('sqlspec_dv_l', 'sqlspec_dv_a', " +
      s"'$base/a', 'g', 'total=fk')").collect()
    GraftSql.sql(spark, "CALL create_join_view('sqlspec_dv_l', 'sqlspec_dv_r', " +
      s"'sqlspec_dv_j', '$base/j', 'fk=fk')").collect()
    val lst = GraftSql.sql(spark, "CALL show_views()").collect()
      .map(r => r.getAs[String]("view") -> r.getAs[String]("kind")).toMap
    assert(lst.get("sqlspec_dv_a").contains("aggregate") &&
      lst.get("sqlspec_dv_j").contains("join"))
    // join-view drop deregisters from BOTH sources' registries
    assert(left.dependentViews().size == 2 && right.dependentViews().size == 1)
    GraftSql.sql(spark, "CALL drop_view('sqlspec_dv_j')").collect()
    assert(left.dependentViews().size == 1 && right.dependentViews().isEmpty)
    GraftSql.sql(spark, "CALL drop_view('sqlspec_dv_a')").collect()
    assert(left.dependentViews().isEmpty)
    val after = GraftSql.sql(spark, "CALL show_views()").collect()
      .map(_.getAs[String]("view")).toSet
    assert(!after.contains("sqlspec_dv_a") && !after.contains("sqlspec_dv_j"))
  }

  test("show_views discovers warehouse materializations with NO session registration") {
    // a fresh session pointed at a warehouse must list existing
    // materializations (round-16 verdict #4): an agg view living AT a
    // warehouse path, and a span-census state living at an explicit
    // location but named in its warehouse source's dependent registry —
    // neither is registered in this session
    val wh = tmp()
    val src = new GraftTable(spark, s"$wh/whd_src", Seq("id"),
      targetFileBytes = 16 * 1024)
    src.bulkInsert(Seq((1L, "a b c d e f"), (2L, "a b c x y z"))
      .toDF("id", "text"))
    val agg = graft.operators.IncrementalAgg.create(spark, src,
      s"$wh/whd_agg", Seq("text"), Seq("n_ids" -> "id"))
    val spanLoc = tmp() + "/span_state"
    graft.llm.IncrementalSpanCensus.create(spark, src, spanLoc, "id", "text")
    // nothing registered under these names in the session registry (the
    // creates above went through the API, which never registers)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      def rows() = GraftSql.sql(spark, "CALL show_views()").collect()
        .map(r => r.getAs[String]("view") ->
          ((r.getAs[String]("kind"), r.getAs[String]("watermark"),
            r.getAs[java.lang.Boolean]("stale")))).toMap
      val lst = rows()
      assert(lst.get("whd_agg").exists { case (k, w, s) =>
        k == "aggregate" && w == "seq=0" && s == java.lang.Boolean.FALSE },
        s"warehouse-resident agg view must list: $lst")
      assert(lst.get("span_state").exists { case (k, w, s) =>
        k == "span" && w == "seq=0" && s == java.lang.Boolean.FALSE },
        s"registry-discovered span state must list: $lst")
      assert(!lst.contains("whd_src"), "plain tables never list")
      // a source commit flips BOTH discovered views stale — freshness is
      // judged against the source's current head, not the session
      src.upsert(Seq((3L, "d e f q r s")).toDF("id", "text"))
      val stale = rows()
      assert(stale("whd_agg")._3 == java.lang.Boolean.TRUE &&
        stale("span_state")._3 == java.lang.Boolean.TRUE)
      // and a session registration of the same root does not duplicate
      GraftSql.register(spark, "whd_agg_reg", agg)
      try {
        val dedup = GraftSql.sql(spark, "CALL show_views()").collect()
          .map(_.getAs[String]("location"))
          .count(_ == agg.root)
        assert(dedup == 1, "one row per view root, registered or discovered")
      } finally GraftSql.deregister(spark, "whd_agg_reg")
    } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
  }

  test("CREATE TABLE / INSERT / DROP TABLE: the managed SQL lifecycle") {
    val wh = tmp()
    GraftSql.install(spark)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      spark.sql(
        """CREATE TABLE graft.ddl_t1 (id BIGINT, v STRING)
           TBLPROPERTIES ('record_key'='id')""")
      // born readable and discoverable: empty, declared user schema
      assert(spark.sql("SELECT * FROM graft.ddl_t1").columns.toSeq == Seq("id", "v"))
      assert(spark.sql("SELECT count(*) AS n FROM graft.ddl_t1").as[Long].head() == 0)
      assert(spark.sql("SHOW TABLES IN graft").select("tableName")
        .as[String].collect().contains("ddl_t1"))
      // descriptor on disk = the table is self-described from commit 0
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(wh, "ddl_t1", "_graft", "table.json")))
      // no trx_seq declared anywhere: the merge tie chain falls through
      // to the commit seq, so successive INSERTs latest-win — and the
      // user schema stays exactly (id, v)
      spark.sql("INSERT INTO graft.ddl_t1 VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO graft.ddl_t1 VALUES (2, 'b2'), (3, 'c')")
      val after = spark.sql("SELECT id, v FROM graft.ddl_t1")
        .as[(Long, String)].collect().toMap
      assert(after == Map(1L -> "a", 2L -> "b2", 3L -> "c"),
        s"second INSERT must win on key 2: $after")
      assert(spark.sql("SELECT * FROM graft.ddl_t1").columns.toSeq == Seq("id", "v"),
        "no bookkeeping column may leak into the user schema")
      // DROP on a warehouse-managed table deletes its directory
      spark.sql("DROP TABLE graft.ddl_t1")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "ddl_t1")))
      assert(!spark.sql("SHOW TABLES IN graft").select("tableName")
        .as[String].collect().contains("ddl_t1"))
      intercept[Exception](spark.sql("SELECT * FROM graft.ddl_t1").collect())
    } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
  }

  test("CTAS with LOCATION creates an external table; DROP keeps its files") {
    val root = tmp()
    GraftSql.install(spark)
    Seq((1L, "x", 10), (2L, "y", 20), (2L, "y2", 21))
      .toDF("id", "v", "score").createOrReplaceTempView("ddl_ctas_src")
    spark.sql(
      s"""CREATE TABLE graft.ddl_t2
          LOCATION '$root'
          TBLPROPERTIES ('record_key'='id')
          AS SELECT * FROM ddl_ctas_src""")
    // CTAS rows land through the keyed upsert: duplicate key 2 collapses
    // (tie within one statement — either version; count is the contract)
    assert(spark.sql("SELECT count(*) AS n FROM graft.ddl_t2").as[Long].head() == 2)
    val t = GraftTable.open(spark, root)
    assert(t.keyFields == Seq("id"))
    spark.sql("DROP TABLE graft.ddl_t2")
    // external (explicit LOCATION, no warehouse): files survive the DROP
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_graft", "table.json")))
    intercept[Exception](spark.sql("SELECT * FROM graft.ddl_t2").collect())
  }

  test("SET TBLPROPERTIES retunes a live table; identity keys refuse loudly") {
    val wh = tmp()
    GraftSql.install(spark)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      spark.sql(
        """CREATE TABLE graft.props_t (id BIGINT, score BIGINT, v STRING)
           TBLPROPERTIES ('record_key'='id', 'target_file_bytes'='8192')""")
      // retune BEFORE the data lands: files written after the toggle
      // carry score min/max, so the range scan file-skips
      spark.sql(
        "ALTER TABLE graft.props_t SET TBLPROPERTIES ('stats_columns'='score')")
      assert(GraftTable.open(spark, s"$wh/props_t").statsColumns == Seq("score"),
        "the republished descriptor must carry the new tuning")
      spark.range(1, 4001)
        .selectExpr("id", "id * 3 AS score", "concat('v', id) AS v")
        .createOrReplaceTempView("props_src")
      spark.sql("INSERT INTO graft.props_t SELECT * FROM props_src")
      val t = GraftTable.open(spark, s"$wh/props_t")
      val total = t.latestCommit().get.files.size
      assert(total >= 4, s"fixture must span several files (got $total)")
      graft.sql.GraftScanMetrics.clear()
      val n = spark.sql(
        "SELECT count(*) AS n FROM graft.props_t WHERE score BETWEEN 300 AND 900")
        .as[Long].head()
      assert(n == 201, s"ids 100..300 expected, got $n")
      val (admitted, tot) =
        graft.sql.GraftScanMetrics.lastScan("graft.props_t").get
      assert(admitted >= 1 && admitted < tot,
        s"post-toggle stats range must file-skip ($admitted of $tot)")
      // every retunable knob reads back through SHOW TBLPROPERTIES —
      // what you can declare or retune, you can see
      val shown = spark.sql("SHOW TBLPROPERTIES graft.props_t")
        .as[(String, String)].collect().toMap
      assert(shown.get("target_file_bytes").contains("8192") &&
        shown.get("stats_columns").contains("score"),
        s"retuned knobs must surface in SHOW TBLPROPERTIES: $shown")
      // UNSET returns the knob to its default
      spark.sql("ALTER TABLE graft.props_t UNSET TBLPROPERTIES ('stats_columns')")
      assert(GraftTable.open(spark, s"$wh/props_t").statsColumns.isEmpty)
      // identity-defining and unknown keys refuse loudly; a stats column
      // missing from the pinned schema refuses too
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.props_t SET TBLPROPERTIES ('record_key'='v')"))
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.props_t SET TBLPROPERTIES ('bucket_count'='8')"))
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.props_t SET TBLPROPERTIES ('no_such_knob'='1')"))
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.props_t SET TBLPROPERTIES ('stats_columns'='nope')"))
      // the failed ALTERs changed nothing
      assert(GraftTable.open(spark, s"$wh/props_t").keyFields == Seq("id"))
      // a STALE pre-retune handle committing afterwards must not undo
      // the retune on disk (the tunedAt freshness guard)
      // no sleep: the descriptor version counter orders a retune against
      // a handle opened in the SAME millisecond (the old wall-clock
      // guard needed Thread.sleep(5) here)
      val stale = GraftTable.open(spark, s"$wh/props_t")
      spark.sql(
        "ALTER TABLE graft.props_t SET TBLPROPERTIES ('stats_columns'='score')")
      stale.upsert(Seq((9999L, 9999L * 3, "v9999", "001"))
        .toDF("id", "score", "v", "trx_seq"))
      assert(GraftTable.open(spark, s"$wh/props_t").statsColumns == Seq("score"),
        "a stale handle's commit must not clobber the retuned descriptor")
    } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
  }

  test("DROP with explicit LOCATION under the warehouse stays external") {
    val wh = tmp()
    GraftSql.install(spark)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      // the LOCATION points INSIDE the warehouse tree but is not the
      // directory the warehouse would have created for this name — a
      // path-prefix managed test would delete it (and in the degenerate
      // LOCATION-equals-warehouse case, every sibling table with it)
      val loc = s"$wh/external_zone/ddl_ext"
      spark.sql(
        s"""CREATE TABLE graft.ddl_ext (id BIGINT, v STRING)
            LOCATION '$loc'
            TBLPROPERTIES ('record_key'='id')""")
      spark.sql("INSERT INTO graft.ddl_ext VALUES (1, 'a')")
      spark.sql("DROP TABLE graft.ddl_ext")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(loc, "_graft", "table.json")),
        "explicit-LOCATION table files must survive DROP even under the warehouse")
      // the genuinely managed shape (parent == warehouse, dir == name)
      // still deletes
      spark.sql(
        """CREATE TABLE graft.ddl_mgd (id BIGINT)
           TBLPROPERTIES ('record_key'='id')""")
      spark.sql("DROP TABLE graft.ddl_mgd")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "ddl_mgd")))
    } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN route the schema-evolution commits") {
    val t = mk("sqlspec_ddl_alter")
    val filesBefore = t.latestCommit().get.files.map(_.path)
    spark.sql("ALTER TABLE graft.sqlspec_ddl_alter ADD COLUMN tag STRING")
    // metadata-only: same data files, new column null-filled
    assert(t.latestCommit().get.files.map(_.path) == filesBefore,
      "ADD COLUMN must not rewrite data files")
    assert(spark.sql("SELECT tag FROM graft.sqlspec_ddl_alter")
      .as[Option[String]].collect().forall(_.isEmpty))
    // fill it through SQL, read it back
    spark.sql("INSERT INTO graft.sqlspec_ddl_alter VALUES (3, 'c2', '009', 'hot')")
    assert(spark.sql(
      "SELECT tag FROM graft.sqlspec_ddl_alter WHERE id = 3").as[String].head() == "hot")
    spark.sql("ALTER TABLE graft.sqlspec_ddl_alter RENAME COLUMN v TO w")
    assert(spark.sql("SELECT w FROM graft.sqlspec_ddl_alter WHERE id = 1")
      .as[String].head() == "a")
    spark.sql("ALTER TABLE graft.sqlspec_ddl_alter DROP COLUMN tag")
    assert(!spark.sql("SELECT * FROM graft.sqlspec_ddl_alter").columns.contains("tag"))
    // protected columns refuse, loudly, through the SQL path too
    intercept[Exception](
      spark.sql("ALTER TABLE graft.sqlspec_ddl_alter DROP COLUMN id"))
  }

  test("ALTER TABLE RENAME TO re-keys external tables and moves managed dirs") {
    // external: registry re-key only, root untouched
    val t = mk("sqlspec_rn_old")
    val root = t.root
    spark.sql("ALTER TABLE graft.sqlspec_rn_old RENAME TO sqlspec_rn_new")
    assert(spark.sql("SELECT count(*) AS n FROM graft.sqlspec_rn_new")
      .as[Long].head() == 3)
    intercept[Exception](spark.sql("SELECT * FROM graft.sqlspec_rn_old").collect())
    assert(GraftTable.open(spark, root).readUser().count() == 3,
      "external rename must not move storage")
    // managed: the warehouse directory follows the new name
    val wh = tmp()
    GraftSql.install(spark)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      spark.sql(
        s"""CREATE TABLE graft.rn_m1 (id BIGINT, v STRING)
            TBLPROPERTIES ('record_key'='id')""")
      spark.sql("INSERT INTO graft.rn_m1 VALUES (7, 'x')")
      spark.sql("ALTER TABLE graft.rn_m1 RENAME TO rn_m2")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "rn_m2")))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "rn_m1")))
      assert(spark.sql("SELECT v FROM graft.rn_m2 WHERE id = 7")
        .as[String].head() == "x")
    } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
  }

  test("SHOW TBLPROPERTIES reads back the engine configuration") {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, statsColumns = Seq("v"), bucketCount = 4)
    t.bulkInsert(Seq((1L, "a", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "sqlspec_props", t)
    val props = spark.sql("SHOW TBLPROPERTIES graft.sqlspec_props")
      .as[(String, String)].collect().toMap
    assert(props("record_key") == "id")
    assert(props("type") == "COPY_ON_WRITE")
    assert(props("stats_columns") == "v")
    assert(props("bucket_count") == "4")
    assert(!props.contains("rli_maintain"), "unset knobs stay silent")
  }

  test("CREATE TABLE misconfiguration fails loudly") {
    GraftSql.install(spark)
    // no record_key property
    intercept[Exception](spark.sql(
      s"CREATE TABLE graft.ddl_bad1 (id BIGINT) LOCATION '${tmp()}'"))
    // record_key not in the schema
    intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.ddl_bad2 (id BIGINT) LOCATION '${tmp()}'
          TBLPROPERTIES ('record_key'='nope')"""))
    // nowhere to put it: no LOCATION, no warehouse conf
    spark.conf.unset("spark.sql.catalog.graft.warehouse")
    intercept[Exception](spark.sql(
      """CREATE TABLE graft.ddl_bad3 (id BIGINT)
         TBLPROPERTIES ('record_key'='id')"""))
    // non-identity partition transform
    intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.ddl_bad4 (id BIGINT, ts TIMESTAMP)
          PARTITIONED BY (days(ts)) LOCATION '${tmp()}'
          TBLPROPERTIES ('record_key'='id')"""))
  }
}
