package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable
import graft.llm.{IncrementalSegmentDedup => ISD, TextAnalysis}

/** Incremental segment dedup: after ANY sequence of insert/update/delete
  * waves, the maintained (n_segs, n_dup_segs, kept_md5) table must equal
  * the batch [[TextAnalysis.segmentDedup]] over the live corpus — and
  * the df=2 BOUNDARY CROSSINGS must rewrite UNCHANGED partner documents
  * (the retroactive half the df state alone can't serve; the posting
  * table exists for it). */
class IncrementalSegmentDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 3 // 3-word segments keep fixtures readable

  private def tmp(): String =
    Files.createTempDirectory("graft-isd").toString

  private def meta(df: org.apache.spark.sql.DataFrame, seq: Int, del: Boolean) =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(del))

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")

  private def assertParity(src: GraftTable, st: ISD.State, clue: String): Unit = {
    val got = ISD.output(st)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val exp = TextAnalysis.segmentDedup(
        src.readUser().select(col("id"), col("text")), "id", "text", W)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == exp, s"$clue: maintained output != batch recompute")
    // df-state integrity: stored counts equal a recompute
    val dfGot = st.df.readUser().select(col("sh"), col("df"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val dfExp = TextAnalysis.segments(
        src.readUser().select(col("id"), col("text")), "id", "text", W)
      .select(md5(col("seg")).as("sh"), col("id")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(dfGot == dfExp, s"$clue: stored df state != recompute")
  }

  test("crossings rewrite UNCHANGED partners; updates and deletes compose") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    // d1/d2 share segment "a b c" (df 2); d1's "d e f" is unique
    src.bulkInsert(meta(docs(
      1L -> "a b c d e f", 2L -> "a b c x y z"), 1, del = false))
    val st = ISD.create(spark, src, tmp(), "id", "text", W)
    assertParity(src, st, "bootstrap")
    assert(ISD.output(st).filter(col("id") === 1L)
      .select(col("n_dup_segs")).as[Long].head() == 1L)

    // wave 1: d3 shares "d e f" — df 1→2 crosses; UNCHANGED d1 must
    // rewrite (its n_dup_segs goes 1 → 2 without d1 appearing in the feed)
    src.upsert(meta(docs(3L -> "d e f q r s"), 2, del = false))
    ISD.maintain(src, st, "id", "text", W, 0L, 1L)
    assertParity(src, st, "insert crossing")
    assert(ISD.output(st).filter(col("id") === 1L)
      .select(col("n_dup_segs")).as[Long].head() == 2L,
      "the unchanged partner doc must pick up the new duplicate")

    // wave 2: delete d2 — "a b c" df 2→1 crosses back; survivor d1 rewrites
    src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true))
    ISD.maintain(src, st, "id", "text", W, 1L, 2L)
    assertParity(src, st, "delete crossing")
    assert(ISD.output(st).filter(col("id") === 1L)
      .select(col("n_dup_segs")).as[Long].head() == 1L)

    // wave 3: d3's text moves off "d e f" — retraction crossing 2→1
    // (d1 rewrites again) plus fresh unique segments for d3
    src.upsert(meta(docs(3L -> "q r s t u v"), 4, del = false))
    ISD.maintain(src, st, "id", "text", W, 2L, 3L)
    assertParity(src, st, "update retraction crossing")
    assert(ISD.output(st).filter(col("id") === 1L)
      .select(col("n_dup_segs")).as[Long].head() == 0L)
  }

  test("maintenance windows compose: (0,1]+(1,2] equals (0,2]") {
    def build(): GraftTable = {
      val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
      src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
        del = false))
      src.upsert(meta(docs(3L -> "d e f q r s"), 2, del = false))
      src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true)
        .unionByName(meta(docs(4L -> "d e f q r s"), 3, del = false)))
      src
    }
    val read = (st: ISD.State) => ISD.output(st)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val s1 = build()
    val t1 = {
      val st = ISD.State(
        new GraftTable(spark, tmp() + "/df", Seq("sh")),
        new GraftTable(spark, tmp() + "/post", Seq("sh", "id")),
        new GraftTable(spark, tmp() + "/out", Seq("id")))
      ISD.bootstrap(s1, st, "id", "text", W, 0L)
      ISD.maintain(s1, st, "id", "text", W, 0L, 1L)
      ISD.maintain(s1, st, "id", "text", W, 1L, 2L)
      st
    }
    val s2 = build()
    val t2 = {
      val st = ISD.State(
        new GraftTable(spark, tmp() + "/df", Seq("sh")),
        new GraftTable(spark, tmp() + "/post", Seq("sh", "id")),
        new GraftTable(spark, tmp() + "/out", Seq("id")))
      ISD.bootstrap(s2, st, "id", "text", W, 0L)
      ISD.maintain(s2, st, "id", "text", W, 0L, 2L)
      st
    }
    assert(read(t1) == read(t2))
    assertParity(s1, t1, "stepwise")
  }

  test("lifecycle: spec-driven refresh, idempotence, stale and rollback refusals") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> "a b c d e f"), 1, del = false))
    val loc = tmp()
    val st = ISD.create(spark, src, loc, "id", "text", W)
    src.upsert(meta(docs(2L -> "a b c x y z"), 2, del = false))
    // cold reopen: nothing but the layout + out-table spec drives refresh
    val reopened = ISD.open(spark, loc)
    assert(ISD.refresh(spark, reopened) == (0L, 1L))
    assertParity(src, reopened, "spec-driven refresh")
    assert(ISD.refresh(spark, reopened) == (1L, 1L), "idempotent when current")
    // the registered-root entry point the viewMaintain walk uses
    src.upsert(meta(docs(3L -> "d e f q r s"), 3, del = false))
    assert(ISD.refreshAt(spark, s"$loc/out") == (1L, 2L))
    assertParity(src, ISD.open(spark, loc), "refreshAt")
    // re-applying a FULLY-applied window is an idempotent no-op (the
    // crash-replay contract: tables already at toSeq skip)
    ISD.maintain(src, reopened, "id", "text", W, 1L, 2L)
    assertParity(src, ISD.open(spark, loc), "full-replay no-op")
    // a genuinely stale window refuses
    val e1 = intercept[IllegalStateException] {
      ISD.maintain(src, reopened, "id", "text", W, 0L, 1L)
    }
    assert(e1.getMessage.contains("do not admit window"))
    // rolled-back source refuses
    src.rollback(0L)
    val e2 = intercept[IllegalStateException] {
      ISD.refresh(spark, reopened)
    }
    assert(e2.getMessage.contains("rolled back"))
  }

  test("viewMaintain keeps the segment state fresh hands-free") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    src.bulkInsert(meta(docs(1L -> "a b c d e f"), 1, del = false))
    val st = ISD.create(spark, src, tmp(), "id", "text", W)
    // the ingest commit itself walks the dependent and refreshes it
    src.upsert(meta(docs(2L -> "a b c x y z"), 2, del = false))
    assert(ISD.appliedSeq(GraftTable.open(spark, st.out.root)) == Some(1L),
      "the commit's walk must bring the segment state forward")
    assertParity(src, st, "hands-free")
  }

  test("a doc updated to NULL text retracts its output row (batch parity)") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
      del = false))
    val st = ISD.create(spark, src, tmp(), "id", "text", W)
    // wave: doc 2's text goes NULL — its segments retract (doc 1's
    // "a b c" loses its duplicate) and its output row must VANISH, not
    // serve the stale census
    src.upsert(meta(Seq((2L, null: String)).toDF("id", "text"), 2, del = false))
    ISD.maintain(src, st, "id", "text", W, 0L, 1L)
    assert(ISD.output(st).filter(col("id") === 2L).count() == 0,
      "null-text docs have no batch output row")
    assert(ISD.output(st).filter(col("id") === 1L)
      .select(col("n_dup_segs")).as[Long].head() == 0L,
      "the retraction must also cross doc 1's segment back to unique")
    assertParity(src, st, "null-text update")
  }

  private def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(from)) { s =>
      s.iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
      }
    }
  }

  private def deleteDir(d: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(d)) scala.util.Using.resource(Files.walk(d)) { s =>
      s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  test("a crash between the out and post commits heals through refresh()") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
      del = false))
    val loc = tmp()
    val st = ISD.create(spark, src, loc, "id", "text", W)
    src.upsert(meta(docs(3L -> "d e f q r s"), 2, del = false))
    // snapshot post/ and df/ at watermark 0, apply the wave, then restore
    // them — byte-identical to a crash AFTER the out commit and BEFORE the
    // post/df commits (commits are directory-level atomic): out=1, post=df=0
    val backup = java.nio.file.Paths.get(tmp())
    copyDir(java.nio.file.Paths.get(s"$loc/post"), backup.resolve("post"))
    copyDir(java.nio.file.Paths.get(s"$loc/df"), backup.resolve("df"))
    assert(ISD.refresh(spark, st) == (0L, 1L))
    Seq("post", "df").foreach { d =>
      deleteDir(java.nio.file.Paths.get(s"$loc/$d"))
      copyDir(backup.resolve(d), java.nio.file.Paths.get(s"$loc/$d"))
    }
    val torn = ISD.open(spark, loc)
    assert(ISD.appliedSeq(torn.out) == Some(1L) &&
      ISD.appliedSeq(torn.post) == Some(0L) &&
      ISD.appliedSeq(torn.df) == Some(0L), "fixture must be torn (t,f,f)")
    // a NEW source commit lands while torn — the failure mode was a
    // permanent 'do not admit window' refusal on every later refresh
    src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true))
    assert(ISD.refresh(spark, torn) == (1L, 2L),
      "refresh must heal the torn (0,1] window, then advance to the head")
    Seq(torn.out, torn.post, torn.df).foreach(t =>
      assert(ISD.appliedSeq(t) == Some(2L)))
    assertParity(src, torn, "post-heal")
    // and the OTHER legal crash shape — (t,t,f), a crash between the post
    // and df commits — with NO new source commit heals to a no-op head
    val backup2 = java.nio.file.Paths.get(tmp())
    copyDir(java.nio.file.Paths.get(s"$loc/df"), backup2.resolve("df"))
    src.upsert(meta(docs(4L -> "m n o p q r"), 4, del = false))
    ISD.refresh(spark, torn)
    deleteDir(java.nio.file.Paths.get(s"$loc/df"))
    copyDir(backup2.resolve("df"), java.nio.file.Paths.get(s"$loc/df"))
    val torn2 = ISD.open(spark, loc)
    assert(ISD.appliedSeq(torn2.df) == Some(2L) &&
      ISD.appliedSeq(torn2.out) == Some(3L), "fixture must be torn (t,t,f)")
    assert(ISD.refresh(spark, torn2) == (3L, 3L))
    assertParity(src, torn2, "idempotent heal at head")
  }

  test("crossing volume above RangeReadCap falls back to the posting scan") {
    // 300 one-segment docs, each gaining an identical-text partner in the
    // wave: 300 > RangeReadCap hashes cross df 1→2 at once, forcing the
    // single-scan path — the per-hash union plan must never reach ~10k legs
    val n = ISD.RangeReadCap + 44
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val base = (0 until n).map(i => (i.toLong, s"w$i x$i y$i"))
    src.bulkInsert(meta(base.toDF("id", "text"), 1, del = false))
    val st = ISD.create(spark, src, tmp(), "id", "text", W)
    src.upsert(meta(base.map { case (i, t) => (i + 10000L, t) }
      .toDF("id", "text"), 2, del = false))
    ISD.maintain(src, st, "id", "text", W, 0L, 1L)
    assertParity(src, st, s"$n simultaneous crossings")
    assert(ISD.output(st).filter(col("n_dup_segs") === 1L).count() == 2L * n,
      "every original doc and every partner must census as duplicated")
  }

  test("driver wave path and distributed fallback write identical state rows") {
    // one mixed wave — insert crossing a segment df UP, delete crossing
    // one DOWN, update to null-segment text — through the driver path
    // (default cap) and the distributed plans (cap 0): all three state
    // tables must be row-identical
    def drive(cap: String): (Seq[(Long, Long, Long, String)],
        Seq[(String, Long)], Seq[(String, Long)]) = {
      spark.conf.set(graft.llm.IncrementalDedup.DriverWaveCapKey, cap)
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"),
          targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(
          1L -> "a b c d e f", 2L -> "a b c x y z", 3L -> "p q r s t u"), 1,
          del = false))
        val st = ISD.create(spark, src, tmp(), "id", "text", W)
        src.upsert(meta(docs(4L -> "p q r j k l"), 2, del = false)
          .unionByName(meta(docs(2L -> "a b c x y z"), 2, del = true))
          .unionByName(meta(docs(1L -> "zz"), 2, del = false)))
        ISD.maintain(src, st, "id", "text", W, 0L, 1L)
        assertParity(src, st, s"cap=$cap")
        (ISD.output(st).as[(Long, Long, Long, String)].collect()
          .sortBy(_._1).toSeq,
          st.post.readUser().select(col("sh"), col("id"))
            .as[(String, Long)].collect().sorted.toSeq,
          st.df.readUser().select(col("sh"), col("df"))
            .as[(String, Long)].collect().sorted.toSeq)
      } finally spark.conf.unset(graft.llm.IncrementalDedup.DriverWaveCapKey)
    }
    val viaDriver = drive(graft.llm.IncrementalDedup.DriverWaveCap.toString)
    val viaDistributed = drive("0")
    assert(viaDriver == viaDistributed,
      "driver and distributed wave paths must write identical state rows")
  }

  test("reliable pins produce the identical segment state (cluster-run pin mode)") {
    def drive(reliable: Boolean): Seq[(Long, Long, Long, String)] = {
      if (reliable) spark.conf.set(graft.util.PinSet.ReliableKey, "true")
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"),
          targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
          del = false))
        val st = ISD.create(spark, src, tmp(), "id", "text", W)
        src.upsert(meta(docs(3L -> "d e f q r s"), 2, del = false))
        src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true))
        ISD.refresh(spark, st)
        val stage = java.nio.file.Paths.get(s"${st.out.root}/_graft/stage-pins")
        if (java.nio.file.Files.isDirectory(stage))
          assert(scala.util.Using.resource(
            java.nio.file.Files.list(stage))(_.count()) == 0,
            "reliable pins must clean their stage dirs after the wave")
        ISD.output(st).as[(Long, Long, Long, String)].collect()
          .sortBy(_._1).toSeq
      } finally spark.conf.unset(graft.util.PinSet.ReliableKey)
    }
    assert(drive(reliable = true) == drive(reliable = false),
      "pin mode must be invisible to the maintained state")
  }

  test("negative ids refuse loudly") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((-3L, "a b c d e f")).toDF("id", "text"), 1,
      del = false))
    val st = ISD.State(
      new GraftTable(spark, tmp() + "/df", Seq("sh")),
      new GraftTable(spark, tmp() + "/post", Seq("sh", "id")),
      new GraftTable(spark, tmp() + "/out", Seq("id")))
    val e = intercept[IllegalStateException] {
      ISD.bootstrap(src, st, "id", "text", W, 0L)
    }
    assert(e.getMessage.contains("negative"))
  }
}
