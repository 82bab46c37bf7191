package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable
import graft.llm.{Dedup, IncrementalSpanCensus => ISC}

/** Incremental duplicated-span census: after ANY sequence of
  * insert/update/delete waves, the maintained (n_shingles, n_dup,
  * dup_ratio) table must equal the batch [[Dedup.duplicatedSpanStats]]
  * over the live corpus — and df=2 BOUNDARY CROSSINGS must move
  * UNCHANGED partner documents' censuses by pure posting arithmetic
  * (no text fetch: a partner's shingle set didn't change, so its n_dup
  * shifts by the signed crossing count over its postings). */
class IncrementalSpanCensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-isc").toString

  private def meta(df: org.apache.spark.sql.DataFrame, seq: Int, del: Boolean) =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(del))

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")

  private def assertParity(src: GraftTable, st: ISC.State, clue: String): Unit = {
    val got = ISC.output(st)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val exp = Dedup.duplicatedSpanStats(
        src.readUser().select(col("id"), col("text")), "id", "text", n = 3)
      .select(col("id"), col("n_shingles"), col("n_dup"), col("dup_ratio"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == exp, s"$clue: maintained census != batch recompute")
    // df-state integrity: stored doc frequencies equal a recompute
    val dfGot = st.df.readUser().select(col("sh"), col("df"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val dfExp = Dedup.shingles(
        src.readUser().select(col("id"), col("text")), "id", "text", n = 3)
      .select(md5(col("s")).as("sh"), col("id"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(dfGot == dfExp, s"$clue: stored df state != recompute")
  }

  test("crossings move UNCHANGED partners by posting arithmetic; waves compose") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    // d1/d2 share the "a b c" 3-gram; d1's other shingles are unique
    src.bulkInsert(meta(docs(
      1L -> "a b c d e f", 2L -> "a b c x y z"), 1, del = false))
    val st = ISC.create(spark, src, tmp(), "id", "text")
    assertParity(src, st, "bootstrap")
    assert(ISC.output(st).filter(col("id") === 1L)
      .select(col("n_dup")).as[Long].head() == 1L)

    // wave 1: d3 shares "d e f" — df 1→2 crosses UP; UNCHANGED d1 must
    // move (its n_dup goes 1 → 2 without d1 appearing in the feed)
    src.upsert(meta(docs(3L -> "p q d e f r"), 2, del = false))
    ISC.maintain(src, st, "id", "text", 3, 0L, 1L)
    assertParity(src, st, "insert crossing")
    assert(ISC.output(st).filter(col("id") === 1L)
      .select(col("n_dup")).as[Long].head() == 2L,
      "the unchanged partner doc must pick up the new duplicate span")

    // wave 2: delete d2 — "a b c" df 2→1 crosses DOWN; survivor d1 moves
    src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true))
    ISC.maintain(src, st, "id", "text", 3, 1L, 2L)
    assertParity(src, st, "delete crossing")
    assert(ISC.output(st).filter(col("id") === 1L)
      .select(col("n_dup")).as[Long].head() == 1L)

    // wave 3: d3's text rewrites off "d e f" (retraction crossing) AND
    // onto "x y z"-free fresh text; d1 moves back to 0 dup spans
    src.upsert(meta(docs(3L -> "g h i j k l"), 4, del = false))
    ISC.maintain(src, st, "id", "text", 3, 2L, 3L)
    assertParity(src, st, "update retraction crossing")
    assert(ISC.output(st).filter(col("id") === 1L)
      .select(col("n_dup")).as[Long].head() == 0L)
  }

  test("maintenance windows compose: (0,1]+(1,2] equals (0,2]") {
    def build(): GraftTable = {
      val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
      src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
        del = false))
      src.upsert(meta(docs(3L -> "p q d e f r"), 2, del = false))
      src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true)
        .unionByName(meta(docs(4L -> "p q d e f r"), 3, del = false)))
      src
    }
    def fresh(src: GraftTable): ISC.State = {
      val loc = tmp()
      val st = ISC.State(
        new GraftTable(spark, s"$loc/df", Seq("sh")),
        new GraftTable(spark, s"$loc/post", Seq("sh", "id")),
        new GraftTable(spark, s"$loc/out", Seq("id")))
      ISC.bootstrap(src, st, "id", "text", 3, 0L)
      st
    }
    val read = (st: ISC.State) => ISC.output(st)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val s1 = build()
    val t1 = fresh(s1)
    ISC.maintain(s1, t1, "id", "text", 3, 0L, 1L)
    ISC.maintain(s1, t1, "id", "text", 3, 1L, 2L)
    val s2 = build()
    val t2 = fresh(s2)
    ISC.maintain(s2, t2, "id", "text", 3, 0L, 2L)
    assert(read(t1) == read(t2))
    assertParity(s1, t1, "stepwise")
  }

  test("lifecycle: spec-driven refresh, torn-window heal, rollback refusal") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> "a b c d e f"), 1, del = false))
    val loc = tmp()
    val st = ISC.create(spark, src, loc, "id", "text")
    src.upsert(meta(docs(2L -> "a b c x y z"), 2, del = false))
    // cold reopen: nothing but the layout + out-table spec drives refresh
    val reopened = ISC.open(spark, loc)
    assert(ISC.refresh(spark, reopened) == (0L, 1L))
    assertParity(src, reopened, "spec-driven refresh")
    assert(ISC.refresh(spark, reopened) == (1L, 1L), "idempotent when current")
    // the registered-root entry point the viewMaintain walk uses
    src.upsert(meta(docs(3L -> "p q d e f r"), 3, del = false))
    assert(ISC.refreshAt(spark, s"$loc/out") == (1L, 2L))
    assertParity(src, ISC.open(spark, loc), "refreshAt")
    // torn crash window (out ahead of post/df after a crash between the
    // commits): heal = replay (df, out] then advance — simulated by
    // snapshotting post/df before a wave and restoring them after
    def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(from)) { s =>
        s.iterator().asScala.foreach { p =>
          val t = to.resolve(from.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(t)
          else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
        }
      }
    }
    def deleteDir(d: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(d)) scala.util.Using.resource(Files.walk(d)) { s =>
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    val backup = java.nio.file.Paths.get(tmp())
    copyDir(java.nio.file.Paths.get(s"$loc/post"), backup.resolve("post"))
    copyDir(java.nio.file.Paths.get(s"$loc/df"), backup.resolve("df"))
    src.upsert(meta(docs(3L -> "p q d e f r"), 4, del = true))
    ISC.refresh(spark, reopened)
    Seq("post", "df").foreach { d =>
      deleteDir(java.nio.file.Paths.get(s"$loc/$d"))
      copyDir(backup.resolve(d), java.nio.file.Paths.get(s"$loc/$d"))
    }
    val torn = ISC.open(spark, loc)
    assert(ISC.appliedSeq(torn.out) == Some(3L) &&
      ISC.appliedSeq(torn.df) == Some(2L), "fixture must be torn (t,f,f)")
    assert(ISC.refresh(spark, torn) == (3L, 3L),
      "refresh must heal the torn window to the head")
    assertParity(src, torn, "post-heal")
    // rolled-back source refuses
    src.rollback(0L)
    val e = intercept[IllegalStateException] { ISC.refresh(spark, torn) }
    assert(e.getMessage.contains("rolled back"))
  }

  test("viewMaintain keeps the span census fresh hands-free; drop_view retires it") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    src.bulkInsert(meta(docs(1L -> "a b c d e f"), 1, del = false))
    val st = ISC.create(spark, src, tmp(), "id", "text")
    // the ingest commit itself walks the dependent and refreshes it
    src.upsert(meta(docs(2L -> "a b c x y z"), 2, del = false))
    assert(ISC.appliedSeq(GraftTable.open(spark, st.out.root)) == Some(1L),
      "the commit's walk must bring the span census forward")
    assertParity(src, st, "hands-free")
    // SQL lifecycle half: register + show_view + drop_view deregisters
    graft.sql.GraftSql.register(spark, "spanv", st.out)
    val shown = graft.sql.GraftSql.sql(spark, "CALL show_view('spanv')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown("kind") == "span" && shown("applied_seq") == "1")
    graft.sql.GraftSql.sql(spark, "CALL drop_view('spanv')").collect()
    assert(src.dependentViews().isEmpty,
      "drop_view must stop hands-free maintenance")
  }

  test("a doc updated below the shingle width retracts its census row") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
      del = false))
    val st = ISC.create(spark, src, tmp(), "id", "text")
    // doc 2's text shrinks under 3 words: no shingles → no batch census
    // row, and its "a b c" retraction crosses doc 1 back to unique
    src.upsert(meta(docs(2L -> "uniq2"), 2, del = false))
    ISC.maintain(src, st, "id", "text", 3, 0L, 1L)
    assert(ISC.output(st).filter(col("id") === 2L).count() == 0,
      "shingle-less docs have no census row")
    assert(ISC.output(st).filter(col("id") === 1L)
      .select(col("n_dup")).as[Long].head() == 0L)
    assertParity(src, st, "short-text update")
  }

  test("driver wave path and distributed fallback write identical state rows") {
    // one mixed wave — insert that crosses a shingle df UP, delete that
    // crosses one DOWN, update to a shingle-less text (retract) — through
    // the driver path (default cap) and the distributed plans (cap 0):
    // all three state tables must be row-identical (the IncrementalDedup
    // driver≡distributed parity contract, applied to the span census)
    def drive(cap: String): (Seq[(Long, Long, Long, Double)],
        Seq[(String, Long)], Seq[(String, Long)]) = {
      spark.conf.set(graft.llm.IncrementalDedup.DriverWaveCapKey, cap)
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"),
          targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(
          1L -> "a b c d e f", 2L -> "a b c x y z", 3L -> "p q r s t u"), 1,
          del = false))
        val st = ISC.create(spark, src, tmp(), "id", "text")
        src.upsert(meta(docs(4L -> "w w p q r s t u"), 2, del = false)
          .unionByName(meta(docs(2L -> "a b c x y z"), 2, del = true))
          .unionByName(meta(docs(1L -> "uniq1"), 2, del = false)))
        ISC.maintain(src, st, "id", "text", 3, 0L, 1L)
        assertParity(src, st, s"cap=$cap")
        (ISC.output(st).as[(Long, Long, Long, Double)].collect()
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

  test("reliable pins produce the identical census (cluster-run pin mode)") {
    def drive(reliable: Boolean): Seq[(Long, Long, Long, Double)] = {
      if (reliable) spark.conf.set(graft.util.PinSet.ReliableKey, "true")
      try {
        val src = new GraftTable(spark, tmp(), Seq("id"),
          targetFileBytes = 16 * 1024)
        src.bulkInsert(meta(docs(1L -> "a b c d e f", 2L -> "a b c x y z"), 1,
          del = false))
        val st = ISC.create(spark, src, tmp(), "id", "text")
        src.upsert(meta(docs(3L -> "p q d e f r"), 2, del = false))
        src.upsert(meta(docs(2L -> "a b c x y z"), 3, del = true))
        ISC.refresh(spark, st)
        // the stage area must be cleaned after the waves land
        val stage = java.nio.file.Paths.get(
          s"${st.out.root}/_graft/stage-pins")
        if (java.nio.file.Files.isDirectory(stage))
          assert(scala.util.Using.resource(
            java.nio.file.Files.list(stage))(_.count()) == 0,
            "reliable pins must clean their stage dirs after the wave")
        ISC.output(st).as[(Long, Long, Long, Double)].collect()
          .sortBy(_._1).toSeq
      } finally spark.conf.unset(graft.util.PinSet.ReliableKey)
    }
    assert(drive(reliable = true) == drive(reliable = false),
      "pin mode must be invisible to the maintained state")
  }
}
