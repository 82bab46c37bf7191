package graft

import org.apache.spark.sql.functions._
import graft.model.Meta
import graft.operators.GraftTable
import graft.llm.{Dedup, IncrementalDedup}

/** Incremental dedup, lifecycle + concurrency: create/refresh from the
  * state alone, stale-window and rollback refusals, racing maintainers
  * under the table lock, parity-assert sharpness, input validation. */
class IncrementalDedupLifecycleSpec extends IncrementalDedupSpecBase {
  import spark.implicits._

  test("lifecycle: create records the spec; refresh runs from the state alone") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> sent(1, 12), 2L -> sent(3, 14)), 1, del = false))
    val state = IncrementalDedup.create(spark, src, tmp(), "id", "text", P)
    assert(IncrementalDedup.appliedSeq(state) == Some(0L))
    src.upsert(meta(docs(3L -> sent(5, 16)), 2, del = false))
    // reopen cold: nothing but the state's own timeline drives refresh
    val reopened = GraftTable.open(spark, state.root)
    val (from, to) = IncrementalDedup.refresh(spark, reopened)
    assert((from, to) == (0L, 1L))
    assertParity(src, reopened, "after spec-driven refresh")
    // idempotent: already-current refresh applies nothing
    assert(IncrementalDedup.refresh(spark, reopened) == (1L, 1L))
  }

  test("stale window and rolled-back source refuse loudly") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> sent(1, 12)), 1, del = false))
    src.upsert(meta(docs(2L -> sent(3, 14)), 2, del = false))
    val state = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    IncrementalDedup.bootstrap(src, state, "id", "text", P, 0L)
    IncrementalDedup.maintain(src, state, "id", "text", P, 0L, 1L)
    // re-applying the SAME window must refuse (double-count guard)
    val e1 = intercept[IllegalStateException] {
      IncrementalDedup.maintain(src, state, "id", "text", P, 0L, 1L)
    }
    assert(e1.getMessage.contains("stale maintenance window"))
    // a source rolled back below the watermark must refuse
    src.rollback(0L)
    val e2 = intercept[IllegalStateException] {
      IncrementalDedup.maintainLatest(src, state, "id", "text", P)
    }
    assert(e2.getMessage.contains("rolled back"))
  }

  test("two racing maintainers: exactly one applies, the loser refuses under the lock") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> sent(1, 12)), 1, del = false))
    val state = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    IncrementalDedup.bootstrap(src, state, "id", "text", P, 0L)
    src.upsert(meta(docs(2L -> sent(3, 14)), 2, del = false))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val start = new java.util.concurrent.CountDownLatch(1)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.await()
          // the state's table lock serializes the merges; the loser's
          // preCommit re-reads the watermark UNDER the lock and refuses
          // instead of double-applying the same window
          try IncrementalDedup.maintain(src, state, "id", "text", P, 0L, 1L)
          catch { case _: IllegalStateException => refusals.incrementAndGet(); () }
        }
      })
    }
    start.countDown()
    tasks.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(refusals.get() == 1, s"exactly one refusal, got ${refusals.get()}")
    assert(IncrementalDedup.appliedSeq(state) == Some(1L))
    assertParity(src, state, "after the race")
  }

  test("parity assert catches a corrupted stored signature row") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> sent(1, 12), 2L -> sent(3, 14)), 1, del = false))
    val state = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    IncrementalDedup.bootstrap(src, state, "id", "text", P, 0L)
    assertParity(src, state, "pre-corruption")
    // corrupt doc 1's stored shingle count THROUGH the table API (the
    // state is a keyed table; an upsert is a legitimate write path a
    // buggy maintainer could take) — the strengthened parity compare
    // must now fail where the old id-only compare stayed green
    // the state table is ordering-free (bootstrap writes no CDC ordering
    // column), so a later upsert statement wins outright
    val row = state.readUser().filter(col("id") === 1L)
      .withColumn("n_sh", col("n_sh") + 7L)
    state.upsert(row)
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      assertParity(src, state, "post-corruption")
    }
    assert(e.getMessage.contains("thash, n_sh"))
  }

  test("null and negative ids refuse loudly") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> sent(1, 12)), 1, del = false))
    val state = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val bad = meta(Seq((-5L, sent(1, 12))).toDF("id", "text"), 1, del = false)
    val src2 = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src2.bulkInsert(bad)
    val e = intercept[IllegalStateException] {
      IncrementalDedup.bootstrap(src2, state, "id", "text", P, 0L)
    }
    assert(e.getMessage.contains("negative"))
  }
}
