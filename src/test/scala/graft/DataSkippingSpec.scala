package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{ColStat, DataFile}
import graft.operators.GraftTable

/** Column-stats index (non-key data skipping) + z-order clustering:
  * correctness of the pruned read, conservativeness of the stat harvest,
  * manifest round-trip of per-file column stats, and the quantitative
  * claim that z-order actually narrows per-file stat spans enough to
  * skip files on BOTH z dimensions.
  */
class DataSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-skip").toString

  /** 4000 rows, key = id, tracked column `v` correlated with id so the
    * key-sorted layout yields tight per-file v-intervals. */
  private def corrTable(): GraftTable = {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, statsColumns = Seq("v", "s"))
    val df = (0L until 4000L).toDF("id")
      .withColumn("v", col("id") * 3)
      .withColumn("s", format_string("s%06d", col("id")))
      .withColumn("trx_seq", lit("001"))
    t.bulkInsert(df)
    t
  }

  test("colStats are harvested with the right kinds and cover the data") {
    val t = corrTable()
    val files = t.latestCommit().get.files
    assert(files.size > 1, "need a multi-file table to test skipping")
    assert(files.forall(_.colStats.contains("v")))
    assert(files.forall(_.colStats("v").kind == "long"))
    assert(files.forall(_.colStats.contains("s")))
    assert(files.forall(_.colStats("s").kind == "string"))
    // stats must bound the actual data: global min/max across files
    val vmin = files.map(_.colStats("v").min.toLong).min
    val vmax = files.map(_.colStats("v").max.toLong).max
    assert(vmin == 0L && vmax == 3L * 3999)
  }

  test("pushed IN on a tracked column triages files by stats overlap") {
    val t = corrTable()
    val files = t.latestCommit().get.files
    // values that all land in the low end of the correlated layout —
    // the In triage must keep only files whose [min,max] holds any
    val scan = t.readUserPruned(Seq(
      org.apache.spark.sql.sources.In("v", Array[Any](3L, 9L, 27L))))
    assert(scan.admittedFiles < scan.totalFiles,
      s"IN must prune on a correlated column (${scan.admittedFiles}/${scan.totalFiles})")
    val got = scan.df.filter(col("v").isin(3L, 9L, 27L))
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 3L), (3L, 9L), (9L, 27L)))
    // values outside every file's range admit nothing
    val none = t.readUserPruned(Seq(
      org.apache.spark.sql.sources.In("v", Array[Any](-5L, 3L * 4000 + 7))))
    assert(none.admittedFiles == 0, s"got ${none.admittedFiles}")
    // string kind: same triage over the s column
    val s1 = t.readUserPruned(Seq(
      org.apache.spark.sql.sources.In("s", Array[Any]("s000010", "s000020"))))
    assert(s1.admittedFiles < s1.totalFiles)
    assert(files.size > 1)
  }

  test("readColumnRange equals filter-on-snapshot and actually prunes files") {
    val t = corrTable()
    val got = t.readColumnRange("v", 300L, 900L)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    val want = t.read().filter(col("v") >= 300 && col("v") <= 900)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
    val files = t.latestCommit().get.files
    val pruned = GraftTable.filesInColumnRange(files, "v", "long", "300", "900")
    assert(pruned.size < files.size,
      s"expected pruning on a correlated column (kept ${pruned.size}/${files.size})")
    // string kind prunes too
    val sPruned = GraftTable.filesInColumnRange(files, "s", "string", "s000100", "s000300")
    assert(sPruned.size < files.size)
  }

  test("point lookup scans only interval-containing files and matches a full filter") {
    val t = corrTable()
    val keys = Seq(3L, 777L, 1500L, 3999L)
    val got = t.readKeys(keys).select("id", "v").as[(Long, Long)]
      .collect().sorted.toSeq
    val want = t.read().filter(col("id").isin(keys: _*))
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want && got.size == keys.size)
    // the probe set clusters into few files — most of the table is skipped
    // (recompute the containing set from the manifest the way the probe does)
    val all = t.latestCommit().get.files
    val enc = keys.map(k => f"$k%019d")
    val containing = all.filter(f => enc.exists(k =>
      GraftTable.cmpKey(f.minKey, k) <= 0 && GraftTable.cmpKey(f.maxKey, k) >= 0))
    assert(containing.size < all.size,
      s"expected file skipping (containing ${containing.size}/${all.size})")
    // absent keys return nothing (and don't blow up the probe)
    assert(t.readKeys(Seq(99999L)).count() == 0)
  }

  test("files without a usable stat are conservatively kept") {
    val files = Seq(
      DataFile("a", Map.empty, "", "", 10, 1,
        Map("v" -> ColStat("long", "0", "99"))),
      DataFile("b", Map.empty, "", "", 10, 1, Map.empty), // no stat
      DataFile("c", Map.empty, "", "", 10, 1,
        Map("v" -> ColStat("string", "0", "99"))), // kind mismatch
      DataFile("d", Map.empty, "", "", 10, 1,
        Map("v" -> ColStat("long", "500", "600"))))
    val kept = GraftTable.filesInColumnRange(files, "v", "long", "100", "400")
    assert(kept.map(_.path) == Seq("b", "c"))
  }

  test("colStats survive the commit manifest round-trip (full and delta)") {
    val t = corrTable()
    // upsert triggers a DELTA manifest record (seq 1 vs checkpoint at 0)
    t.upsert(Seq((7L, 21L, "s000007x", "002")).toDF("id", "v", "s", "trx_seq"))
    val c = t.latestCommit().get
    assert(c.seq == 1)
    val fresh = new GraftTable(spark, t.root, Seq("id"),
      statsColumns = Seq("v", "s"))
    val reread = fresh.latestCommit().get
    assert(reread.files.map(f => f.path -> f.colStats).toMap ==
      c.files.map(f => f.path -> f.colStats).toMap)
    assert(reread.files.forall(_.colStats.nonEmpty))
  }

  test("z-order keeps the snapshot identical and narrows BOTH dimensions") {
    // two independent uniform dimensions: key-sorted layout is tight on x
    // (x == id) but each file spans nearly all of y; z-order splits the
    // span on both
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, statsColumns = Seq("x", "y"))
    val df = (0L until 4096L).toDF("id")
      .withColumn("x", col("id"))
      // y decorrelated from id via bit-reversal-ish mix (deterministic)
      .withColumn("y", (col("id") * 2654435761L) % 4096L)
      .withColumn("trx_seq", lit("001"))
    t.bulkInsert(df)
    val before = t.read().select("id", "x", "y")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val keyFiles = t.latestCommit().get.files
    def span(fs: Seq[DataFile], c: String): Double =
      fs.map(f => f.colStats(c).max.toLong - f.colStats(c).min.toLong).sum.toDouble / fs.size
    val ySpanKey = span(keyFiles, "y")

    t.clusterZOrder(Seq("x", "y"))
    val zFiles = t.latestCommit().get.files
    val after = t.read().select("id", "x", "y")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(after == before, "z-order must not change table contents")
    assert(zFiles.size > 1)
    // key-sorted files each span ~the full y domain; z-ordered files must
    // do strictly better on y while staying bounded on x
    val ySpanZ = span(zFiles, "y")
    assert(ySpanZ < ySpanKey * 0.7,
      s"z-order should narrow y spans (key-sorted $ySpanKey, z $ySpanZ)")
    // and a 2-D box query prunes: narrow range on y alone skips files
    val yPruned = GraftTable.filesInColumnRange(zFiles, "y", "long", "0", "511")
    assert(yPruned.size < zFiles.size,
      s"y-range should prune z-ordered files (kept ${yPruned.size}/${zFiles.size})")
    // correctness of the pruned read on the z layout
    val got = t.readColumnRange("y", 0L, 511L).select("id").as[Long].collect().sorted.toSeq
    val want = df.filter(col("y") <= 511).select("id").as[Long].collect().sorted.toSeq
    assert(got == want)
    // 2-D box: the kept set is the INTERSECTION of per-dimension prunes,
    // strictly smaller than either dimension alone on this layout
    val xKept = GraftTable.filesInColumnRange(zFiles, "x", "long", "0", "1023")
    val boxKept = GraftTable.filesInColumnRange(xKept, "y", "long", "0", "511")
    assert(boxKept.size < xKept.size && boxKept.size < yPruned.size)
    val gotBox = t.readColumnBox(Seq(("x", 0L, 1023L), ("y", 0L, 511L)))
      .select("id").as[Long].collect().sorted.toSeq
    val wantBox = df.filter(col("x") <= 1023 && col("y") <= 511)
      .select("id").as[Long].collect().sorted.toSeq
    assert(gotBox == wantBox)
  }

  test("z-order falls back to the key layout when a z column has no numeric bounds") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val df = (0L until 100L).toDF("id")
      .withColumn("s", concat(lit("v"), col("id")))
      .withColumn("trx_seq", lit("001"))
    t.bulkInsert(df)
    val before = t.read().select("id", "s").as[(Long, String)].collect().sorted.toSeq
    val c = t.clusterZOrder(Seq("s", "id")) // string casts to null doubles
    assert(c.extra.get("zorder_fallback").contains("no_bounds"))
    assert(t.read().select("id", "s").as[(Long, String)].collect().sorted.toSeq == before)
  }

  test("partition read scans only the requested partition's files") {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      partitionFields = Seq("p"), targetFileBytes = 16 * 1024)
    val df = (0L until 1000L).toDF("id")
      .withColumn("p", concat(lit("g"), (col("id") % 4).cast("string")))
      .withColumn("v", col("id"))
      .withColumn("trx_seq", lit("001"))
    t.bulkInsert(df)
    val got = t.readPartition(Map("p" -> "g2"))
      .select("id").as[Long].collect().sorted.toSeq
    val want = (2L until 1000L by 4).toSeq
    assert(got == want)
    // the physical scan reads exactly the g2 files from the manifest
    val all = t.latestCommit().get.files
    val g2Files = all.count(_.partition.get("p").contains("g2"))
    assert(g2Files < all.size)
    val scanned = t.readPartition(Map("p" -> "g2"))
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.sum
    assert(scanned == g2Files, s"scanned $scanned files, manifest admits $g2Files")
    // unknown partition value -> empty, unknown column -> loud failure
    assert(t.readPartition(Map("p" -> "nope")).count() == 0)
    intercept[IllegalArgumentException] { t.readPartition(Map("q" -> "x")) }
  }

  test("non-global MOR merge keeps same-keyed rows in different partitions distinct") {
    val t = new GraftTable(spark, tmp(), Seq("id"), partitionFields = Seq("p"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead,
      globalIndex = false)
    t.bulkInsert(Seq((42L, "p1", "a", "001"), (7L, "p1", "b", "001"))
      .toDF("id", "p", "v", "trx_seq"))
    // same key lands in ANOTHER partition via delta logs: under non-global
    // identity these are two distinct live rows — the merge-on-read view
    // must group by (partition, key), not key alone
    t.upsert(Seq((42L, "p2", "c", "002")).toDF("id", "p", "v", "trx_seq"))
    val got = t.readUser().select("id", "p", "v")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == Seq((7L, "p1", "b"), (42L, "p1", "a"), (42L, "p2", "c")))
    val p1 = t.readPartition(Map("p" -> "p1")).select("id").as[Long]
      .collect().sorted.toSeq
    assert(p1 == Seq(7L, 42L))
    // ONE batch carrying the same key in both partitions: precombine must
    // dedup by (partition, key) — Hudi's HoodieKey — not collapse them
    t.upsert(Seq((42L, "p1", "d", "003"), (42L, "p2", "e", "003"))
      .toDF("id", "p", "v", "trx_seq"))
    val after = t.readUser().filter(col("id") === 42L).select("p", "v")
      .as[(String, String)].collect().sorted.toSeq
    assert(after == Seq(("p1", "d"), ("p2", "e")))
  }

  test("card audit validates Luhn and redacts only valid cards") {
    val docs = Seq(
      (1L, "pay with 4532015112830366 now"),   // valid 16-digit
      (2L, "fake 1234567890123456 here"),      // candidate, invalid
      (3L, "short 123456789012 run"),          // 12 digits: not a candidate
      (4L, "two 4111111111111111 and 4532015112830366 cards"))
      .toDF("doc_id", "text")
    val got = graft.llm.Scrub.cardAudit(docs, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 1, 1, "pay with <CARD> now")))
    assert(got(1) == ((2L, 1, 0, "fake 1234567890123456 here")))
    assert(got(2) == ((3L, 0, 0, "short 123456789012 run")))
    assert(got(3) == ((4L, 2, 2, "two <CARD> and <CARD> cards")))
  }

  test("upsert widens column types (int→long, float→double) across the merge") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val base = (0L until 2000L).toDF("id")
      .withColumn("n", col("id").cast("int"))
      .withColumn("x", col("id").cast("float"))
      .withColumn("trx_seq", lit("001"))
    t.bulkInsert(base)
    // the batch carries LONG n (beyond int range) and DOUBLE x, touching
    // only a key sliver — untouched narrow files must stay readable under
    // the widened manifest schema
    val batch = Seq((5L, 5000000000L, 2.5d, "002"), (7L, -6000000000L, 0.25d, "002"))
      .toDF("id", "n", "x", "trx_seq")
    t.upsert(batch)
    val sch = t.read().schema
    assert(sch("n").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("x").dataType == org.apache.spark.sql.types.DoubleType)
    val got = t.readUser().filter(col("id").isin(3L, 5L, 7L))
      .select("id", "n", "x").as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((3L, 3L, 3.0d), (5L, 5000000000L, 2.5d), (7L, -6000000000L, 0.25d)))
    assert(t.read().count() == 2000)
    // an unwidenable clash fails loudly instead of corrupting
    val clash = Seq((9L, "not-a-number", "003")).toDF("id", "n", "trx_seq")
    intercept[IllegalArgumentException] { t.upsert(clash) }
  }

  test("insert-only upsert keeps the full manifest schema for carried files") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert((0L until 100L).toDF("id")
      .withColumn("v", col("id").cast("int"))
      .withColumn("note", concat(lit("n"), col("id")))
      .withColumn("trx_seq", lit("001")))
    // all-new keys above the global max: affected = empty, every prior
    // file is carried — the committed schema must still be the widened
    // UNION (note survives, v widens), not the batch's own narrow schema
    t.upsert(Seq((1000L, 5000000000L, "002")).toDF("id", "v", "trx_seq"))
    val sch = t.read().schema
    assert(sch.fieldNames.contains("note"), "carried column vanished from the manifest schema")
    assert(sch("v").dataType == org.apache.spark.sql.types.LongType)
    val got = t.readUser().filter(col("id").isin(5L, 1000L))
      .select("id", "v", "note").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(got == Seq((5L, 5L, Some("n5")), (1000L, 5000000000L, None)))
    assert(t.read().count() == 101)
  }

  test("incremental feed resolves commits that archiving moved off the active timeline") {
    val base = Files.createTempDirectory("graft-feed-archive")
    val out = s"$base/out"
    val ck = base.resolve("ck.seq")
    val t = new GraftTable(spark, s"$base/table", Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead)
    t.bulkInsert((0L until 200L).toDF("id")
      .withColumn("v", col("id")).withColumn("trx_seq", lit("001")))
    t.upsert(Seq((3L, 300L, "002")).toDF("id", "v", "trx_seq"))
    t.upsert(Seq((4L, 400L, "003")).toDF("id", "v", "trx_seq"))
    // archive everything but the tip BEFORE the consumer catches up
    t.archive(keepLast = 1)
    val h = graft.streaming.IncrementalFeed.start(t, ck, startSeq = 0L,
      pollMs = 50L) { (df, _, _) => df.write.mode("append").parquet(out) }
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (h.consumedSeq < 2) {
        h.checkFailed()
        assert(System.currentTimeMillis() < deadline, "feed stuck behind the archive")
        Thread.sleep(50)
      }
    } finally h.stop()
    val emitted = spark.read.parquet(out).select("id", "v")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(emitted == Seq((3L, 300L), (4L, 400L)),
      s"archived-window changes must still deliver, got $emitted")
  }

  test("MOR delta commit widens types; merge-on-read view reads old base files") {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead)
    val base = (0L until 500L).toDF("id")
      .withColumn("n", col("id").cast("int"))
      .withColumn("trx_seq", lit("001"))
    t.bulkInsert(base)
    t.upsert(Seq((11L, 7000000000L, "002")).toDF("id", "n", "trx_seq"))
    val got = t.readUser().filter(col("id").isin(10L, 11L))
      .select("id", "n").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 10L), (11L, 7000000000L)))
    // compaction folds wide logs + narrow base into a consistent base
    t.compact()
    assert(t.read().schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(t.readUser().filter(col("id") === 11L)
      .select("n").as[Long].head() == 7000000000L)
  }

  test("weighted sampling matches a JVM recomputation of the integer rule") {
    val docs = Seq((1L, "en", 100), (2L, "en", 1999), (3L, "en", 2000),
      (4L, "de", 0), (5L, "de", 3500), (6L, "de", 65))
      .toDF("doc_id", "lang", "n_chars")
    val got = graft.llm.Sampling
      .weightedStats(docs, "doc_id", "lang", "n_chars", unitWeight = 2000L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsamp:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map(b => f"$b%02x").mkString, 16)
    }
    def keep(id: Long, w: Long): Boolean = bucket(id) * 2000L < w * 65536L
    val rows = Seq((1L, "en", 100L), (2L, "en", 1999L), (3L, "en", 2000L),
      (4L, "de", 0L), (5L, "de", 3500L), (6L, "de", 65L))
    val want = rows.groupBy(_._2).map { case (lang, rs) =>
      (lang, rs.size.toLong, rs.count(r => keep(r._1, r._3)).toLong,
        rs.filter(r => keep(r._1, r._3)).map(_._3).sum)
    }.toSeq.sortBy(_._1)
    assert(got == want)
    // a doc at/above unitWeight is always kept (p capped at 1)
    assert(keep(3L, 2000L) && keep(5L, 3500L))
  }

  test("incremental feed skips maintenance rewrites and resumes from its checkpoint") {
    val base = Files.createTempDirectory("graft-feed-spec")
    val out = s"$base/out"
    val ck = base.resolve("ck.seq")
    val t = new GraftTable(spark, s"$base/table", Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead)
    t.bulkInsert((0L until 300L).toDF("id")
      .withColumn("v", col("id")).withColumn("trx_seq", lit("001")))
    def feed() = graft.streaming.IncrementalFeed.start(t, ck, startSeq = 0L,
      pollMs = 50L) { (df, _, _) => df.write.mode("append").parquet(out) }
    def await(h: graft.streaming.IncrementalFeed.Handle, n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (h.consumedSeq < n) {
        h.checkFailed()
        assert(System.currentTimeMillis() < deadline, s"feed stuck below seq $n")
        Thread.sleep(50)
      }
    }
    val h = feed()
    try {
      t.upsert(Seq((5L, 500L, "002")).toDF("id", "v", "trx_seq")); await(h, 1)
      t.compact(); await(h, 2) // rewrites every row — must NOT re-emit
      t.upsert(Seq((7L, 700L, "003")).toDF("id", "v", "trx_seq")); await(h, 3)
    } finally h.stop()
    val emitted = spark.read.parquet(out).select("id", "v")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(emitted == Seq((5L, 500L), (7L, 700L)),
      s"feed must emit exactly the two upserts, got $emitted")
    // a fresh feed resumes from the persisted checkpoint: nothing re-emits
    val h2 = feed()
    try {
      t.upsert(Seq((9L, 900L, "004")).toDF("id", "v", "trx_seq")); await(h2, 4)
    } finally h2.stop()
    val after = spark.read.parquet(out).select("id", "v")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(after == Seq((5L, 500L), (7L, 700L), (9L, 900L)))
  }

  test("stream-stream interval join equals the batch join") {
    val dir = s"${tmp()}/events"
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (0L, ts(0), 1L, "view", 10.00, "{}"),
      (1L, ts(5), 1L, "click", 1.25, "{}"),   // pairs with view@0 (in 10m)
      (2L, ts(30), 1L, "view", 20.00, "{}"),  // too far from click@5
      (3L, ts(33), 1L, "click", 2.50, "{}"),  // pairs with view@30
      (4L, ts(3), 2L, "click", 5.00, "{}"),   // pairs with view@8 (click first)
      (5L, ts(8), 2L, "view", 7.75, "{}"),
      (6L, ts(0), 3L, "view", 1.00, "{}"))    // no click for user 3
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(dir)
    val got = graft.streaming.StreamJoin
      .attributionStats(spark, dir, "skip_spec_join_sink", windowMinutes = 10, slices = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // user 1: (click@5, view@0) view-first, cents 125+1000;
    //         (click@33, view@30) view-first, cents 250+2000
    // user 2: (click@3, view@8) click-first, cents 500+775
    val want = Seq((1L, 2L, 2L, 1125L + 2250L), (2L, 1L, 0L, 1275L))
    assert(got == want)
  }

  test("record-level index build fails loudly on a NULL record key") {
    // a null-keyed row would otherwise file under the hive null-partition
    // bucket dir, invisible to every probe — the build must refuse
    // a STRING key column: a null value encodes to a NULL record key
    // (integral keys format to the literal "null" and stay non-null)
    val t = new GraftTable(spark, tmp(), Seq("k"), targetFileBytes = 8 * 1024)
    t.bulkInsert(Seq(("a", "ok", "001"), (null, "bad", "001"))
      .toDF("k", "v", "trx_seq"))
    val e = intercept[Exception](t.buildRecordIndex(numBuckets = 4))
    def messages(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ messages(x.getCause)
    assert(messages(e).exists(_.contains("NULL record key")),
      s"expected a loud NULL-key failure, got: $e")
  }

  test("record-level index: O(buckets) stabs name exactly the key-holding files") {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 8 * 1024)
    t.bulkInsert((0L until 4000L).map(i => (i, s"v$i", "001"))
      .toDF("id", "v", "trx_seq"))
    val total = t.latestCommit().get.files.size
    assert(total >= 8, s"need a multi-file table (got $total)")
    val seq = t.buildRecordIndex(numBuckets = 16)
    assert(seq == t.latestCommit().get.seq)
    val probes = Seq(5L, 1999L, 3998L).map(k => f"$k%019d")
    val df = t.readKeysIndexed(probes)
    // stab bound: the data scan schedules only the files the index named —
    // never O(total files), regardless of manifest size
    val scanned = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
    }.sum
    assert(scanned <= probes.size && scanned < total,
      s"index must name at most one file per probed key (scanned $scanned)")
    // exact result, identical to the interval-index path
    val got = df.select("id", "v").as[(Long, String)].collect().toSet
    assert(got == Set((5L, "v5"), (1999L, "v1999"), (3998L, "v3998")))
    val viaIntervals = t.readKeys(probes).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(got == viaIntervals)
    // absent keys return empty, not an error
    assert(t.readKeysIndexed(Seq(f"${999999L}%019d")).isEmpty)
    // a commit after the build makes the index stale — refuse, never serve
    // retired files
    t.upsert(Seq((5L, "patched", "002")).toDF("id", "v", "trx_seq"))
    intercept[IllegalArgumentException](t.readKeysIndexed(probes))
    // rebuild at the new seq serves the patched row
    t.buildRecordIndex(numBuckets = 16)
    val patched = t.readKeysIndexed(probes).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(patched == Set((5L, "patched"), (1999L, "v1999"), (3998L, "v3998")))
  }

  test("record-index maintenance rewrites only changed buckets; the rest carry") {
    val root = tmp()
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 8 * 1024)
    t.bulkInsert((0L until 4000L).map(i => (i, s"v$i", "001"))
      .toDF("id", "v", "trx_seq"))
    t.buildRecordIndex(numBuckets = 16)
    val priorSeq = t.latestCommit().get.seq
    // narrow upsert: one file group's keys move
    t.upsert(Seq((7L, "u7", "002"), (8L, "u8", "002")).toDF("id", "v", "trx_seq"))
    val seq = t.maintainRecordIndex()
    assert(seq == t.latestCommit().get.seq)
    // correctness: identical to what a full rebuild would serve
    val probes = Seq(7L, 8L, 1999L, 3998L).map(k => f"$k%019d")
    val got = t.readKeysIndexed(probes).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((7L, "u7"), (8L, "u8"), (1999L, "v1999"), (3998L, "v3998")))
    // scale shape: most buckets CARRY their prior shard-dir pointer in
    // the published meta (zero bytes moved on any store — the map
    // indirection replaces the old hard-link carry), only the churn's
    // buckets point at a freshly written dir
    def dirsOf(seqN: Long): Map[String, String] = {
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      import org.json4s.jackson.JsonMethods
      (JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(root, "_graft", "rli", s"c$seqN.json")))
        \ "dirs").extract[Map[String, String]]
    }
    val prior = dirsOf(priorSeq)
    val now = dirsOf(seq)
    val carried = now.count { case (b, d) => prior.get(b).contains(d) }
    assert(carried > 0, "unchanged buckets must carry their prior shard dirs")
    assert(carried < now.size, "changed buckets must be rewritten into a new dir")
    // full snapshot still exact through the maintained index path
    assert(t.readKeysIndexed(Seq(f"${0L}%019d")).select("v").as[String].head() == "v0")
  }
}
