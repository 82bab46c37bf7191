package graft

import org.apache.spark.sql.functions._
import graft.model.Meta
import graft.operators.GraftTable
import graft.llm.{Dedup, IncrementalDedup}

/** Incremental dedup, layout/engine parity: the MOR main state vs the
  * COW fixture, the driver vs distributed band-delta and CC paths, and
  * the reliable-pin mode — every choice must be invisible in the
  * maintained state. */
class IncrementalDedupLayoutSpec extends IncrementalDedupSpecBase {
  import spark.implicits._

  test("MOR main state (the production layout) equals the COW fixture state row for row") {
    // round 21: create() ships a MERGE_ON_READ main state (tombstone
    // upsert per wave, every-8th compaction); a COW state keeps the
    // locked merge. Same waves through both layouts must leave
    // identical live rows — and both must match the batch recompute.
    def drive(mor: Boolean): Seq[(Long, String, Long, Long)] = {
      val src = new GraftTable(spark, tmp(), Seq("id"))
      src.bulkInsert(meta(docs(
        1L -> sent(1, 12), 2L -> sent(3, 14), 3L -> sent(50, 60)), 1,
        del = false))
      val state =
        if (mor) IncrementalDedup.stateAt(spark, tmp())
        else new GraftTable(spark, tmp(), Seq("id"),
          clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes)
      IncrementalDedup.bootstrap(src, state, "id", "text", P, 0L)
      // wave: one near-dup insert (merge), one delete (split), one
      // rewrite to fresh text (rewire)
      src.upsert(meta(docs(4L -> sent(2, 13)), 2, del = false)
        .unionByName(meta(docs(3L -> sent(50, 60)), 2, del = true))
        .unionByName(meta(docs(2L -> sent(100, 111)), 2, del = false)))
      IncrementalDedup.maintain(src, state, "id", "text", P, 0L, 1L)
      assertParity(src, state, s"mor=$mor")
      state.readUser().select(col("id"), col("thash"), col("n_sh"), col("comp"))
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(drive(mor = true) == drive(mor = false),
      "MOR and COW state layouts must hold identical live rows")
  }

  test("driver and distributed band-delta paths write the identical band store") {
    // one wave exercising every delta shape: a new unique group (add),
    // a smaller id joining an existing group (rep handoff: add + del of
    // the old rep's rows), an update rewiring a doc to a new group
    // (retract + add), and a whole-group deletion (pure tombstones)
    def run(forceDistributed: Boolean): (GraftTable, GraftTable) = {
      if (forceDistributed)
        spark.conf.set(IncrementalDedup.DriverWaveCapKey, "0")
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(10L -> sent(1, 12), 11L -> sent(1, 12),
          20L -> sent(3, 14), 30L -> sent(5, 16)), 1, del = false))
        src.upsert(meta(docs(6L -> sent(1, 12), 7L -> sent(100, 112),
          30L -> sent(7, 18)), 2, del = false)
          .unionByName(meta(docs(20L -> sent(3, 14)), 2, del = true)))
        val st = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
        IncrementalDedup.bootstrap(src, st, "id", "text", P, 0L)
        IncrementalDedup.maintain(src, st, "id", "text", P, 0L, 1L)
        (src, st)
      } finally if (forceDistributed)
        spark.conf.unset(IncrementalDedup.DriverWaveCapKey)
    }
    val (s1, st1) = run(forceDistributed = false)
    val (s2, st2) = run(forceDistributed = true)
    val readBands = (st: GraftTable) =>
      GraftTable.open(spark, IncrementalDedup.bandsRootOf(st)).readUser()
        .select(col("bk"), col("rid"), col("thash"), col("sid"), col("n_sh"))
        .as[(String, Long, String, String, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val (b1, b2) = (readBands(st1), readBands(st2))
    assert(b1.nonEmpty, "the wave must touch the band store")
    assert(b1 == b2, "driver vs distributed band-store rows diverge")
    assertParity(s1, st1, "driver band-delta path")
    assertParity(s2, st2, "distributed band-delta path")
  }

  test("driver union-find and distributed CC label waves identically") {
    // the capped driver CC (default) vs the distributed loop (forced by
    // a zero cap) must produce byte-identical state over a wave that
    // exercises merges, splits and rewires
    def drive(forceDistributed: Boolean): Seq[(Long, Long)] = {
      if (forceDistributed)
        spark.conf.set(IncrementalDedup.DriverCcEdgeCapKey, "0")
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"),
          targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(
          1L -> sent(1, 12), 2L -> sent(3, 14), 5L -> sent(100, 112),
          6L -> sent(102, 114)), 1, del = false))
        val state = IncrementalDedup.create(spark, src, tmp(), "id", "text", P)
        // wave: bridge 3 joins cluster {1,2}; member 5 rewrites away
        // (split); 7 glues identically to 6
        src.upsert(meta(docs(3L -> sent(2, 13), 7L -> sent(102, 114)), 2,
          del = false))
        src.upsert(meta(docs(5L -> "uniq5"), 3, del = false))
        IncrementalDedup.refresh(spark, state)
        state.readUser().select(col("id"), col("comp"))
          .as[(Long, Long)].collect().sortBy(_._1).toSeq
      } finally spark.conf.unset(IncrementalDedup.DriverCcEdgeCapKey)
    }
    assert(drive(forceDistributed = false) == drive(forceDistributed = true),
      "CC engine choice must be invisible to the maintained labels")
    // the union-find itself: min labels, self-loop singletons, chains
    val uf = IncrementalDedup.driverComponents(
      Array((9L, 4L), (4L, 2L), (11L, 11L), (7L, 8L)))
    assert(uf == Map(9L -> 2L, 4L -> 2L, 2L -> 2L, 11L -> 11L, 7L -> 7L, 8L -> 7L))
  }

  test("reliable pins produce the identical cluster state (cluster-run pin mode)") {
    def drive(reliable: Boolean): Seq[(Long, String, Seq[Long], Long, Long)] = {
      if (reliable) spark.conf.set(graft.util.PinSet.ReliableKey, "true")
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"),
          targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(
          1L -> sent(1, 12), 2L -> sent(3, 14), 5L -> sent(100, 112)), 1,
          del = false))
        val state = IncrementalDedup.create(spark, src, tmp(), "id", "text", P)
        // one retract-heavy wave: a near-dup joins, a member rewrites away
        src.upsert(meta(docs(3L -> sent(2, 13)), 2, del = false))
        src.upsert(meta(docs(2L -> "uniq2"), 3, del = false))
        IncrementalDedup.refresh(spark, state)
        val stage = java.nio.file.Paths.get(s"${state.root}/_graft/stage-pins")
        if (java.nio.file.Files.isDirectory(stage))
          assert(scala.util.Using.resource(
            java.nio.file.Files.list(stage))(_.count()) == 0,
            "reliable pins must clean their stage dirs after the wave")
        state.readUser()
          .select(col("id"), col("thash"), col("sig"), col("n_sh"), col("comp"))
          .as[(Long, String, Seq[Long], Long, Long)].collect()
          .sortBy(_._1).toSeq
      } finally spark.conf.unset(graft.util.PinSet.ReliableKey)
    }
    assert(drive(reliable = true) == drive(reliable = false),
      "pin mode must be invisible to the maintained state")
  }
}
