package graft

import org.apache.spark.sql.functions._
import graft.model.Meta
import graft.operators.GraftTable
import graft.llm.{Dedup, IncrementalDedup}

/** Incremental corpus dedup, wave parity: after ANY sequence of
  * insert/update/delete waves, the maintained state must equal a fresh
  * batch [[Dedup.minhashComponents]] run over the live corpus — cluster
  * merges via bridge docs, splits via member deletion, text updates
  * rewiring membership, identical-text glue, zero-shingle singletons,
  * comp-label relabeling when the min member leaves. */
class IncrementalDedupSpec extends IncrementalDedupSpecBase {
  import spark.implicits._

  test("insert waves: join, merge and glue clusters equal the batch run") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val state = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    // wave 0: cluster {1,2} (near-dup), singleton 3, zero-shingle 4
    src.bulkInsert(meta(docs(
      1L -> sent(1, 12), 2L -> sent(3, 14),
      3L -> sent(100, 112), 4L -> "too short"), 1, del = false))
    IncrementalDedup.bootstrap(src, state, "id", "text", P, 0L)
    assertParity(src, state, "bootstrap")
    assert(IncrementalDedup.clusters(state).as[(Long, Long)].collect().toSet
      == Set((1L, 1L), (2L, 1L)))

    // wave 1: 5 extends {1,2}; 6 is IDENTICAL to 3 (glue, no verify);
    // 7 starts a new pair with 8; 9 zero-shingle identical to 4 (NO glue)
    src.upsert(meta(docs(
      5L -> sent(5, 16), 6L -> sent(100, 112),
      7L -> sent(200, 212), 8L -> sent(202, 214),
      9L -> "too short"), 2, del = false))
    IncrementalDedup.maintainLatest(src, state, "id", "text", P)
    assertParity(src, state, "wave 1")
    val c1 = IncrementalDedup.clusters(state).as[(Long, Long)].collect().toSet
    assert(c1.contains((5L, 1L)) && c1.contains((6L, 3L)) && c1.contains((8L, 7L)))
    assert(!c1.exists(_._1 == 4L) && !c1.exists(_._1 == 9L),
      "zero-shingle identical docs must NOT glue (batch star contract)")

    // wave 2: 10 BRIDGES clusters {1,2,5} and {7,8} — they must merge
    // (10 near-dups 5 and 7 via overlapping spans)
    src.upsert(meta(docs(10L -> (sent(7, 16) + " " + sent(200, 206))), 3,
      del = false))
    IncrementalDedup.maintainLatest(src, state, "id", "text", P)
    assertParity(src, state, "wave 2 (bridge)")
  }

  test("deletes split; updates rewire; min-member loss relabels") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val state = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    // chain 1~2~3 (1 and 3 NOT near-dups of each other), pair {10,11}
    src.bulkInsert(meta(docs(
      1L -> sent(1, 12), 2L -> sent(3, 14), 3L -> sent(5, 16),
      10L -> sent(300, 312), 11L -> sent(302, 314)), 1, del = false))
    IncrementalDedup.bootstrap(src, state, "id", "text", P, 0L)
    assertParity(src, state, "bootstrap")
    assert(IncrementalDedup.clusters(state)
      .filter(col("comp") === 1L).count() == 3, "chain clustered")

    // deleting the chain's MIDDLE must split {1,3}; deleting 10 (the
    // comp label of {10,11}) leaves 11 a singleton
    src.upsert(meta(docs(2L -> sent(3, 14), 10L -> sent(300, 312)), 2, del = true))
    IncrementalDedup.maintainLatest(src, state, "id", "text", P)
    assertParity(src, state, "after split deletes")
    assert(IncrementalDedup.clusters(state).count() == 0,
      "both clusters dissolved: chain split + pair lost a member")

    // update 3's text to near-dup 11's — the pair re-forms across the
    // old component boundary, labeled by the MIN member (3)
    src.upsert(meta(docs(3L -> sent(303, 315)), 3, del = false))
    IncrementalDedup.maintainLatest(src, state, "id", "text", P)
    assertParity(src, state, "after rewiring update")
    assert(IncrementalDedup.clusters(state).as[(Long, Long)].collect().toSet
      == Set((3L, 3L), (11L, 3L)))
  }

  test("maintenance windows compose: (0,1]+(1,2] equals (0,2]") {
    def build(): GraftTable = {
      val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
      src.bulkInsert(meta(docs(1L -> sent(1, 12), 2L -> sent(3, 14)), 1, del = false))
      src.upsert(meta(docs(3L -> sent(5, 16), 4L -> sent(400, 412)), 2, del = false))
      src.upsert(meta(docs(2L -> sent(3, 14)), 3, del = true)
        .unionByName(meta(docs(5L -> sent(402, 414)), 3, del = false)))
      src
    }
    val s1 = build()
    val st1 = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    IncrementalDedup.bootstrap(s1, st1, "id", "text", P, 0L)
    IncrementalDedup.maintain(s1, st1, "id", "text", P, 0L, 1L)
    IncrementalDedup.maintain(s1, st1, "id", "text", P, 1L, 2L)
    val s2 = build()
    val st2 = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    IncrementalDedup.bootstrap(s2, st2, "id", "text", P, 0L)
    IncrementalDedup.maintain(s2, st2, "id", "text", P, 0L, 2L)
    val read = (t: GraftTable) => t.readUser()
      .select(col("id"), col("comp"), col("thash"), col("n_sh"))
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(read(st1) == read(st2))
    assertParity(s1, st1, "stepwise")
  }

  test("a long wave train crosses the band-store compaction boundary exactly") {
    // the band store is MERGE_ON_READ with inline compaction every
    // BandsCompactEvery (8) delta commits — 11 waves cross that boundary,
    // so this pins (a) tombstone latest-wins correctness through the logs,
    // (b) the compaction fold, and (c) reads on both sides of it
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> sent(1, 12), 2L -> sent(3, 14)), 1, del = false))
    val st = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    IncrementalDedup.bootstrap(src, st, "id", "text", P, 0L)
    (1 to 11).foreach { w =>
      val base = 100L * w
      // each wave: one new near-dup of doc 1's neighborhood, one unique
      // doc, and from wave 3 on a deletion of an earlier wave's near-dup
      val ins = meta(docs(base -> sent(1, 12), (base + 1) -> sent(base.toInt, base.toInt + 12)),
        w + 1, del = false)
      val wave =
        if (w >= 3) ins.unionByName(meta(docs((100L * (w - 2)) -> sent(1, 12)),
          w + 1, del = true))
        else ins
      src.upsert(wave)
      IncrementalDedup.maintain(src, st, "id", "text", P, (w - 1).toLong, w.toLong)
    }
    assertParity(src, st, "11-wave train over the compaction boundary")
    // the band store actually compacted: outstanding logs were folded
    // at least once (history carries a compaction commit)
    val bands = GraftTable.open(spark, IncrementalDedup.bandsRootOf(st))
    assert(bands.history().exists(_.action == "compact"),
      s"band store must compact inside the train: ${bands.history().map(_.action)}")
  }
}
