package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Try
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable

/** Writer-concurrency guarantees (O4 + ST4): racing upserts serialize
  * through the table lock — losers fail loudly rather than corrupting the
  * timeline — and the surviving timeline is a consistent linear history.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("racing writers: every commit that succeeds lands on a linear, consistent timeline") {
    val root = Files.createTempDirectory("graft-race").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((0L, "base", "00001", false)).toDF("id", "v", "trx_seq", Meta.Deleted))

    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val results = (1 to 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        def call(): Either[Throwable, Long] = {
          start.await()
          Try {
            t.upsert(Seq((i.toLong, s"w$i", f"$i%05d", false))
              .toDF("id", "v", "trx_seq", Meta.Deleted)).seq
          }.toEither
        }
      })
    }
    start.countDown()
    val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()

    val succeeded = outcomes.collect { case Right(seq) => seq }
    val failed = outcomes.collect { case Left(e) => e }
    assert(succeeded.nonEmpty, "at least one writer must win")
    // losers failed on the lock, not with corruption
    failed.foreach(e => assert(e.isInstanceOf[IllegalStateException], s"unexpected: $e"))
    // surviving timeline is strictly linear: 0..maxSeq with no gaps
    val seqs = t.history().map(_.seq)
    assert(seqs == (0L to seqs.max).toSeq, s"timeline has gaps: $seqs")
    // every surviving commit's rows are readable and include the base row
    val snap = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(snap(0L) == "base")
    assert(snap.size == 1 + succeeded.size)
  }

  test("OCC: lock-free racing writers all land; overlap resolves latest-wins; no orphans") {
    val root = Files.createTempDirectory("graft-occ").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert((0L until 400L).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.lit("base"))
      .withColumn("trx_seq", org.apache.spark.sql.functions.lit("00001")))

    // writer A stamps %2 keys at seq 8; writer B stamps %4 keys at seq 9 —
    // the %4 overlap must end up with B regardless of commit order
    val a = (0L until 400L by 2).map(k => (k, "A", "00008")).toDF("id", "v", "trx_seq")
    val b = (0L until 400L by 4).map(k => (k, "B", "00009")).toDF("id", "v", "trx_seq")
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fs = Seq(a, b).map { batch =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await(); t.upsertOptimistic(batch).seq }
      })
    }
    start.countDown()
    val seqs = fs.map(_.get(120, TimeUnit.SECONDS)).sorted
    pool.shutdown()
    assert(seqs == Seq(1L, 2L), s"both writers must commit (got $seqs)")

    val snap = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(snap.size == 400)
    (0L until 400L).foreach { k =>
      val want = if (k % 4 == 0) "B" else if (k % 2 == 0) "A" else "base"
      assert(snap(k) == want, s"key $k: got ${snap(k)}, want $want")
    }

    // no orphans: every parquet file on disk is referenced by some commit
    val referenced = t.history().flatMap(c => (c.files ++ c.logFiles).map(_.path)).toSet
    val onDisk = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(
          java.nio.file.Paths.get(root, "data"))) { s =>
        s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(p => java.nio.file.Paths.get(root).relativize(p).toString).toSet
      }
    }
    assert(onDisk.subsetOf(referenced),
      s"orphan staged files left behind: ${onDisk -- referenced}")
  }

  test("OCC soak: three writers x three rounds all land on a linear timeline") {
    val root = Files.createTempDirectory("graft-occ-soak").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert((0L until 300L).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.lit(0L))
      .withColumn("trx_seq", org.apache.spark.sql.functions.lit("00000")))
    val pool = Executors.newFixedThreadPool(3)
    val fs = (0 until 3).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (1 to 3).foreach { r =>
          // writer w stamps its own residue class; rounds strictly increase.
          // Hot-spot contention: every writer races every round, so give a
          // retry budget well above the default (losing 5 straight races
          // is routine here, and the caller-visible failure is loud)
          val seq = r * 3 + w + 1
          t.upsertOptimistic((w.toLong until 300L by 3)
            .map(k => (k, seq.toLong, f"$seq%05d")).toDF("id", "v", "trx_seq"),
            maxRetries = 50)
          ()
        }
      })
    }
    fs.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    // linear, gapless timeline: 0 (bulk) + 9 upserts
    val seqs = t.history().map(_.seq)
    assert(seqs == (0L to 9L).toSeq, s"timeline not linear: $seqs")
    // every key holds its writer's FINAL round (latest trx_seq wins)
    val snap = t.readUser().select("id", "v").as[(Long, Long)].collect().toMap
    assert(snap.size == 300)
    (0L until 300L).foreach { k =>
      val w = (k % 3).toInt
      assert(snap(k) == 3 * 3 + w + 1, s"key $k: got ${snap(k)}")
    }
  }

  test("OCC on MOR suppresses inline compaction (post-commit conflict would double-apply)") {
    val root = Files.createTempDirectory("graft-occ-mor").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      tableType = GraftTable.MergeOnRead, compactEvery = 1)
    t.bulkInsert(Seq((0L, 0L, "00000")).toDF("id", "v", "trx_seq"))
    // the optimistic path must land a plain delta commit — its inline
    // compaction (a post-commit maintenance step) losing a race would
    // bubble into the retry loop and re-apply the already-committed batch
    t.upsertOptimistic(Seq((1L, 1L, "00001")).toDF("id", "v", "trx_seq"))
    assert(t.history().map(_.action) == Seq("bulk_insert", "delta_commit"))
    // the LOCKED upsert still honors the inline trigger
    t.upsert(Seq((2L, 2L, "00002")).toDF("id", "v", "trx_seq"))
    assert(t.history().map(_.action) ==
      Seq("bulk_insert", "delta_commit", "delta_commit", "compact"))
    val snap = t.readUser().select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(snap == Seq((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("OCC vs clean(1): maintenance fence drains writers — no lost update, no read-after-delete") {
    val root = Files.createTempDirectory("graft-occ-clean").toString
    // short stale window so marker heartbeats are fast (1.25 s refresh)
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      staleLockMs = 5000)
    t.bulkInsert((0L until 200L).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.lit(0L))
      .withColumn("trx_seq", org.apache.spark.sql.functions.lit("00000")))
    // history for clean(1) to chew on — old versions of every even key
    (1 to 2).foreach { r =>
      t.upsert((0L until 200L by 2).map(k => (k, r.toLong, f"$r%05d"))
        .toDF("id", "v", "trx_seq"))
    }

    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val rounds = 6
    val writer = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { start.await()
        (3 to 2 + rounds).foreach { r =>
          t.upsertOptimistic((0L until 200L by 2).map(k => (k, r.toLong, f"$r%05d"))
            .toDF("id", "v", "trx_seq"), maxRetries = 50)
        }
      }
    })
    val cleanErrs = new java.util.concurrent.atomic.AtomicInteger(0)
    val maintainer = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { start.await()
        // aggressive retention: every cycle deletes all non-latest files —
        // without the fence this reliably rips files out from under the
        // writer's merge scan
        (1 to 12).foreach { _ =>
          try t.clean(retainCommits = 1)
          catch { case _: Throwable => cleanErrs.incrementAndGet(); () }
          Thread.sleep(150)
        }
      }
    })
    start.countDown()
    writer.get(300, TimeUnit.SECONDS)
    maintainer.get(300, TimeUnit.SECONDS)
    pool.shutdown()

    assert(cleanErrs.get() == 0, s"clean() threw ${cleanErrs.get()} times")
    // no lost update: every even key carries the writer's FINAL round
    val snap = t.readUser().select("id", "v").as[(Long, Long)].collect().toMap
    assert(snap.size == 200)
    (0L until 200L).foreach { k =>
      val want = if (k % 2 == 0) (2 + rounds).toLong else 0L
      assert(snap(k) == want, s"key $k: got ${snap(k)}, want $want")
    }
    // timeline linear, barrier state fully retracted
    val seqs = t.history().map(_.seq)
    assert(seqs == (seqs.min to seqs.max).toSeq, s"timeline has gaps: $seqs")
    assert(!Files.exists(java.nio.file.Paths.get(root, "_graft", "maint.lock")),
      "maintenance fence left behind")
    val inflight = java.nio.file.Paths.get(root, "_graft", "inflight")
    if (Files.exists(inflight))
      assert(java.nio.file.Files.list(inflight).count() == 0,
        "in-flight markers left behind")
  }

  test("OCC x partial-update: both writers land; columns merge per the documented fold") {
    val root = Files.createTempDirectory("graft-occ-partial").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      partialUpdate = true)
    t.bulkInsert((0L until 200L).map(i => (i, Some("a0"), Some(0L), "001"))
      .toDF("id", "a", "b", "trx_seq"))
    // writer A touches ONLY column a (ordering 002); writer B ONLY
    // column b (ordering 003). Both must land via OCC. The column
    // outcome follows the documented materialized-fold semantics:
    //  - b = 9 always (B holds the highest ordering for b);
    //  - a = "A" iff A committed BEFORE B — if B materialized first, its
    //    whole row carries ordering 003, so A's later-arriving 002
    //    update is a LATE partial image and loses (the in-order
    //    boundary mergePartial documents; same as Hudi's payload).
    val batchA = (0L until 200L).map(i => (i, Some("A"), None: Option[Long], "002"))
      .toDF("id", "a", "b", "trx_seq")
    val batchB = (0L until 200L).map(i => (i, None: Option[String], Some(9L), "003"))
      .toDF("id", "a", "b", "trx_seq")
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fs = Seq(batchA, batchB).map { b =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { start.await(); t.upsertOptimistic(b, maxRetries = 20).seq }
      })
    }
    start.countDown()
    val Seq(seqA, seqB) = fs.map(_.get(180, TimeUnit.SECONDS))
    pool.shutdown()
    assert(Seq(seqA, seqB).sorted == Seq(1L, 2L), s"both writers must commit ($seqA, $seqB)")
    val wantA = if (seqA < seqB) "A" else "a0"
    val got = t.readUser().select($"id", $"a", $"b")
      .as[(Long, Option[String], Option[Long])].collect()
    assert(got.length == 200)
    got.foreach { case (id, a, b) =>
      assert(a.contains(wantA) && b.contains(9L),
        s"key $id: ($a, $b), want ($wantA, 9) for commit order A=$seqA B=$seqB")
    }
  }

  test("maintenance fence waits out a live marker but proceeds past a dead writer's stale one") {
    val root = Files.createTempDirectory("graft-fence-stale").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      staleLockMs = 1500)
    t.bulkInsert(Seq((0L, "a", "001")).toDF("id", "v", "trx_seq"))
    t.upsert(Seq((0L, "b", "002")).toDF("id", "v", "trx_seq"))
    // a crashed OCC writer's in-flight marker: exists with a just-now
    // heartbeat stamp in its lease payload, then never heartbeats again
    val inflight = java.nio.file.Paths.get(root, "_graft", "inflight")
    Files.createDirectories(inflight)
    val dead = inflight.resolve("w-deadwriter")
    Files.write(dead, s"0 - ${System.currentTimeMillis()}".getBytes)
    val t0 = System.currentTimeMillis()
    val cleaned = t.clean(retainCommits = 1)
    val waited = System.currentTimeMillis() - t0
    // clean() had to wait for the marker to go stale (~staleLockMs), not
    // the full drain deadline, and then actually did its work
    assert(waited >= 1000 && waited < 30000, s"drain waited ${waited}ms")
    assert(cleaned >= 1, "expired files must be reclaimed after the drain")
    assert(t.readUser().count() == 1)
    Files.deleteIfExists(dead)
  }

  test("clean() reclaims crashed-writer stage dirs but spares fresh and referenced ones") {
    val root = Files.createTempDirectory("graft-stage-gc").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      staleLockMs = 60000)
    t.bulkInsert((0L until 50L).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.col("id"))
      .withColumn("trx_seq", org.apache.spark.sql.functions.lit("001")))
    t.upsert(Seq((1L, 99L, "002")).toDF("id", "v", "trx_seq"))
    // a crashed writer's abandoned stage: unreferenced dir, old mtime
    val orphan = java.nio.file.Paths.get(root, "data", "c9-deadbeef")
    Files.createDirectories(orphan)
    val of = orphan.resolve("part-0.parquet")
    Files.write(of, Array[Byte](1, 2, 3))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 120000)
    Files.setLastModifiedTime(of, old)
    Files.setLastModifiedTime(orphan, old)
    // a LIVE writer's stage: unreferenced but fresh — must survive
    val live = java.nio.file.Paths.get(root, "data", "c9-feedf00d")
    Files.createDirectories(live)
    Files.write(live.resolve("part-0.parquet"), Array[Byte](4, 5))
    t.clean(retainCommits = 2)
    assert(!Files.exists(orphan), "stale orphan stage must be GC'd")
    assert(Files.exists(live), "fresh (possibly in-flight) stage must survive")
    // all referenced data intact
    assert(t.readUser().count() == 50)
  }

  test("retried identical commit is absorbed; conflicting same-seq commit fails") {
    val root = Files.createTempDirectory("graft-idem").toString
    val tl = new graft.model.Timeline(root)
    val f = graft.model.DataFile("data/c0/p.parquet", Map.empty, "a", "z", 10, 100)
    val c = graft.model.Commit(0L, "bulk_insert", Seq(f), "{}", None, 123L)
    tl.commit(c)
    // identical re-commit (crash-after-commit retry) returns the existing
    val again = tl.commit(c.copy(commitTimeMs = 999L))
    assert(again.commitTimeMs == 123L)
    // different file set at the same seq = a true conflict
    val conflict = c.copy(files = Seq(f.copy(path = "data/c0/other.parquet")))
    assertThrows[IllegalStateException](tl.commit(conflict))
  }
}
