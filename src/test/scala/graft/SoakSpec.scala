package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable

/** Long-timeline soak: many CDC cycles with cleaning + archiving running
  * continuously (the reference's steady state: delta every 2h, retain 5
  * commits, archive past 10 — handler.py:88-93). The snapshot must stay
  * equal to the stateful reduction at every step, and storage must not
  * leak: after clean, no data file on disk is unreferenced by a retained
  * manifest.
  */
class SoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Ev(id: Long, v: String, seq: Int, del: Boolean)

  private def applyBatch(state: Map[Long, Ev], batch: Seq[Ev]): Map[Long, Ev] = {
    val combined = batch.groupBy(_.id).map { case (id, vs) => id -> vs.maxBy(e => (e.seq, e.del)) }
    combined.foldLeft(state) { case (st, (id, w)) =>
      val winner = st.get(id) match {
        case Some(ex) => if (Ordering[(Int, Boolean)].gt((w.seq, w.del), (ex.seq, ex.del))) w else ex
        case None => w
      }
      if (winner.del) st - id else st.updated(id, winner)
    }
  }

  test("20 CDC cycles with continuous clean+archive: snapshot correct, no storage leak") {
    val rnd = new scala.util.Random(11)
    val root = Files.createTempDirectory("graft-soak").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 8 * 1024)
    var state = Map.empty[Long, Ev]
    var seqCounter = 0

    (1 to 20).foreach { cycle =>
      val batch = (1 to (3 + rnd.nextInt(12))).map { _ =>
        seqCounter += 1
        Ev(1L + rnd.nextInt(30), f"v$seqCounter", seqCounter, rnd.nextInt(6) == 0)
      }
      t.upsert(batch.map(e => (e.id, e.v, f"${e.seq}%05d", e.del))
        .toDF("id", "v", "trx_seq", Meta.Deleted))
      state = applyBatch(state, batch)
      t.clean(retainCommits = 3)
      t.archive(keepLast = 5)

      val got = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
      assert(got == state.map { case (k, e) => k -> e.v }, s"cycle $cycle diverged")
    }

    // timeline bounded by archiving
    assert(t.history().size <= 5)

    // no leaked data files: everything on disk under data/ is referenced by
    // a retained commit (clean may legitimately keep files shared with them)
    val referenced = t.history().flatMap(c => (c.files ++ c.logFiles).map(_.path)).toSet
    val dataDir = Paths.get(root, "data")
    val onDisk = java.nio.file.Files.walk(dataDir).iterator()
    var leaked = List.empty[String]
    while (onDisk.hasNext) {
      val p = onDisk.next()
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet")) {
        val rel = Paths.get(root).relativize(p).toString
        if (!referenced.contains(rel)) leaked ::= rel
      }
    }
    assert(leaked.isEmpty, s"unreferenced files left on disk: $leaked")
  }

  test("OCC x maintenance soak: 3 lock-free writers vs clean/archive/compact over 30+ commits") {
    val root = Files.createTempDirectory("graft-occ-maint-soak").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      staleLockMs = 5000)
    t.bulkInsert((0L until 300L).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.lit(0L))
      .withColumn("trx_seq", org.apache.spark.sql.functions.lit("00000")))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val start = new java.util.concurrent.CountDownLatch(1)
    val rounds = 10
    val writers = (0 until 3).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { start.await()
          (1 to rounds).foreach { r =>
            val seq = r * 3 + w + 1
            t.upsertOptimistic((w.toLong until 300L by 3)
              .map(k => (k, seq.toLong, f"$seq%05d")).toDF("id", "v", "trx_seq"),
              maxRetries = 100)
            ()
          }
        }
      })
    }
    val maintErrs = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val maintainer = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { start.await()
        (1 to 10).foreach { i =>
          try {
            t.clean(retainCommits = 5)
            if (i % 3 == 0) t.archive(keepLast = 10)
            if (i % 4 == 0) t.compact()
          } catch { case e: Throwable => maintErrs.compareAndSet(null, e) }
          Thread.sleep(400)
        }
      }
    })
    start.countDown()
    writers.foreach(_.get(540, java.util.concurrent.TimeUnit.SECONDS))
    maintainer.get(540, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    assert(maintErrs.get() == null, s"maintenance threw: ${maintErrs.get()}")

    // serial oracle: every key holds its writer's final-round stamp —
    // compaction/cleaning/archiving must be invisible to the data
    val snap = t.readUser().select("id", "v").as[(Long, Long)].collect().toMap
    assert(snap.size == 300)
    (0L until 300L).foreach { k =>
      val w = (k % 3).toInt
      assert(snap(k) == rounds * 3 + w + 1, s"key $k: got ${snap(k)}")
    }
    // >= 30 writer commits landed (plus compactions)
    val total = t.history().map(_.seq).max
    assert(total >= 30L, s"expected >= 30 commits, latest seq = $total")

    // storage sane after a final clean: every parquet on disk is referenced
    // by a retained manifest (no orphans from losing writers or maintenance)
    t.clean(retainCommits = 1)
    val referenced = (t.history() ++ new graft.model.Timeline(root).readArchived())
      .flatMap(c => (c.files ++ c.logFiles).map(_.path)).toSet
    val onDisk = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(Paths.get(root, "data"))) { s =>
        s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(p => Paths.get(root).relativize(p).toString).toSet
      }
    }
    assert(onDisk.subsetOf(referenced),
      s"orphan files left on disk: ${onDisk -- referenced}")
    // barrier state fully retracted
    assert(!Files.exists(Paths.get(root, "_graft", "maint.lock")))
    val inflight = Paths.get(root, "_graft", "inflight")
    if (Files.exists(inflight))
      assert(java.nio.file.Files.list(inflight).count() == 0)
  }

  test("OCC x replace-family soak: lock-free writers vs deleteWhere/mergeInto/clean") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-occ-replace-soak").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      staleLockMs = 5000, statsColumns = Seq("id"))
    t.bulkInsert((0L until 400L).toDF("id")
      .withColumn("v", lit(0L)).withColumn("trx_seq", lit("00000")))

    // DISJOINT DOMAINS make the concurrent end state deterministic:
    // ids 0..299 belong to the 3 OCC writers (striped % 3), 300..349 to
    // the predicate deleter, 350..399 to the merger. Every collision is
    // therefore a pure commit-seq race — exactly what the retry paths
    // must absorb without losing any side's effect.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val start = new java.util.concurrent.CountDownLatch(1)
    val rounds = 6
    val writers = (0 until 3).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { start.await()
          (1 to rounds).foreach { r =>
            val seq = r * 3 + w + 1
            t.upsertOptimistic((w.toLong until 300L by 3)
              .map(k => (k, seq.toLong, f"$seq%05d")).toDF("id", "v", "trx_seq"),
              maxRetries = 100)
            ()
          }
        }
      })
    }
    val mixErrs = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val mixer = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { start.await()
        (1 to 5).foreach { i =>
          try {
            t.deleteWhere(Seq(("id", 300L + 10 * (i - 1), 299L + 10 * i)))
            t.mergeInto((350L until 400L).map(k => (k, 1000L + i)).toDF("id", "nv"),
              whenMatchedSet = Map("v" -> col("src_nv")),
              insertWhenNotMatched = false)
            if (i % 2 == 0) t.clean(retainCommits = 8)
          } catch { case e: Throwable => mixErrs.compareAndSet(null, e) }
          Thread.sleep(300)
        }
      }
    })
    start.countDown()
    writers.foreach(_.get(540, java.util.concurrent.TimeUnit.SECONDS))
    mixer.get(540, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    assert(mixErrs.get() == null, s"mixer threw: ${mixErrs.get()}")

    val snap = t.readUser().select("id", "v").as[(Long, Long)].collect().toMap
    // writers: every stripe holds its final-round stamp
    (0L until 300L).foreach { k =>
      val w = (k % 3).toInt
      assert(snap(k) == rounds * 3 + w + 1, s"key $k: got ${snap.get(k)}")
    }
    // deleter: 300..349 fully removed despite racing writers
    assert((300L until 350L).forall(!snap.contains(_)),
      "predicate-deleted keys must stay gone")
    // merger: 350..399 carry the LAST merge round's value
    (350L until 400L).foreach(k =>
      assert(snap(k) == 1005L, s"key $k: got ${snap.get(k)}"))
    assert(snap.size == 350)
    assert(t.fsck()._4, "fsck must be green after the mixed soak")
  }

  test("50-commit sf0.01 cadence with clean/archive/cluster: correct snapshots, bounded metadata") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus").cache()
    val keys = orders.select($"o_orderkey").as[Long].collect().sorted
    val root = Files.createTempDirectory("graft-soak50").toString
    val t = new GraftTable(spark, root, Seq("o_orderkey"),
      targetFileBytes = 256 * 1024)

    // driver-side expectation: (key -> (seq, status)), deletes drop keys
    var state: Map[Long, (Int, String)] =
      keys.map(k => k -> (0, "O")).toMap
    t.bulkInsert(orders.withColumn("o_orderstatus", org.apache.spark.sql.functions.lit("O"))
      .withColumn("trx_seq", org.apache.spark.sql.functions.lit(f"${0}%05d"))
      .withColumn(Meta.Deleted, org.apache.spark.sql.functions.lit(false)))

    (1 to 50).foreach { i =>
      val slice = keys.filter(_ % 50 == i % 50)
      val isDelCycle = i % 7 == 3
      val batch = slice.map { k =>
        val del = isDelCycle && k % 3 == 0
        (k, s"S$i", f"$i%05d", del)
      }
      t.upsert(batch.toSeq.toDF("o_orderkey", "o_orderstatus", "trx_seq", Meta.Deleted))
      batch.foreach { case (k, v, _, del) =>
        if (del) state -= k else state = state.updated(k, (i, v))
      }
      if (i % 5 == 0) t.clean(retainCommits = 5)
      if (i % 10 == 0) t.archive(keepLast = 10)
      if (i % 13 == 0) t.cluster()

      if (i % 10 == 0) {
        val got = t.readUser().select($"o_orderkey", $"o_orderstatus")
          .as[(Long, String)].collect().toMap
        val want = state.map { case (k, (_, v)) => k -> v }
        assert(got.size == want.size, s"cycle $i: ${got.size} vs ${want.size} rows")
        assert(got == want, s"cycle $i diverged")
      }
    }

    // live-file count bounded (clustering keeps files right-sized: the
    // table is ~0.5 MB compressed, so a handful of 256 KB-target files)
    val live = t.latestCommit().get.files
    assert(live.nonEmpty && live.size <= 32, s"live files unbounded: ${live.size}")
    // active timeline bounded by archiving; commit files bounded by churn
    assert(t.history().size <= 17)
    val commitsDir = Paths.get(root, "_graft", "commits")
    val commitFiles = java.nio.file.Files.list(commitsDir).iterator()
    var totalMeta = 0L; var nMeta = 0
    while (commitFiles.hasNext) {
      val p = commitFiles.next()
      if (p.toString.endsWith(".commit.json")) { totalMeta += java.nio.file.Files.size(p); nMeta += 1 }
    }
    assert(nMeta <= 17 && totalMeta < 2 * 1024 * 1024,
      s"_graft metadata unbounded: $nMeta files, $totalMeta bytes")
  }
}
