package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.{GraftTable, IncrementalAgg}

/** Incremental view maintenance: the maintained (group → count, sums)
  * table must equal a full recompute of the source snapshot after every
  * commit — through inserts, updates, deletes, GROUP MIGRATION (an
  * update that moves a row between groups), and group extinction. */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-ivm").toString

  private def meta(df: org.apache.spark.sql.DataFrame, seq: Int, del: Boolean) =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(del))

  private val groups = Seq("grp")
  private val sums = graft.operators.Measures(sums = Map("v" -> col("v")))

  private def recompute(src: GraftTable) =
    src.readUser().groupBy("grp").agg(count(lit(1)).as("n"), sum(col("v")).as("v"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  private def maintained(agg: GraftTable) =
    agg.readUser().select("grp", "n", "v")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  test("maintained aggregate tracks inserts, updates, deletes, group migration") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "grp", "v"), 1, del = false))                       // seq 0
    IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
    assert(maintained(agg) == recompute(src))

    // seq 1: update v in place, MIGRATE key 2 a→b, insert key 4, delete key 3
    src.upsert(meta(Seq((1L, "a", 11L), (2L, "b", 20L), (4L, "c", 7L))
      .toDF("id", "grp", "v"), 2, del = false)
      .unionByName(meta(Seq((3L, "b", 5L)).toDF("id", "grp", "v"), 2, del = true)))
    IncrementalAgg.maintain(src, agg, groups, sums, 0L, 1L)
    assert(maintained(agg) == recompute(src), "after commit 1")
    assert(recompute(src) == Seq(("a", 1L, 11L), ("b", 1L, 20L), ("c", 1L, 7L)))

    // seq 2: extinguish group c entirely; add two rows to a
    src.upsert(meta(Seq((5L, "a", 100L), (6L, "a", 200L)).toDF("id", "grp", "v"),
      3, del = false)
      .unionByName(meta(Seq((4L, "c", 7L)).toDF("id", "grp", "v"), 3, del = true)))
    IncrementalAgg.maintain(src, agg, groups, sums, 1L, 2L)
    assert(maintained(agg) == recompute(src), "after commit 2")
    assert(!maintained(agg).exists(_._1 == "c"),
      "an extinct group must be DELETED from the aggregate, not kept at zero")
  }

  test("maintenance ranges compose: (0,1] then (1,2] equals (0,2]") {
    def build(): (GraftTable, GraftTable) = {
      val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
      val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
      src.bulkInsert(meta(Seq((1L, "x", 1L), (2L, "y", 2L)).toDF("id", "grp", "v"),
        1, del = false))
      src.upsert(meta(Seq((1L, "y", 3L), (3L, "z", 9L)).toDF("id", "grp", "v"),
        2, del = false))
      src.upsert(meta(Seq((2L, "y", 8L)).toDF("id", "grp", "v"), 3, del = false)
        .unionByName(meta(Seq((3L, "z", 9L)).toDF("id", "grp", "v"), 3, del = true)))
      IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
      (src, agg)
    }
    val (s1, a1) = build()
    IncrementalAgg.maintain(s1, a1, groups, sums, 0L, 1L)
    IncrementalAgg.maintain(s1, a1, groups, sums, 1L, 2L)
    val (s2, a2) = build()
    IncrementalAgg.maintain(s2, a2, groups, sums, 0L, 2L)
    assert(maintained(a1) == maintained(a2))
    assert(maintained(a1) == recompute(s1))
  }

  test("maintainLatest resumes from the recorded watermark and is idempotent") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 1L)).toDF("id", "grp", "v"), 1, del = false))
    assert(IncrementalAgg.appliedSeq(agg).isEmpty)
    IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
    assert(IncrementalAgg.appliedSeq(agg).contains(0L))
    // two source commits arrive; ONE catch-up covers both
    src.upsert(meta(Seq((2L, "a", 2L)).toDF("id", "grp", "v"), 2, del = false))
    src.upsert(meta(Seq((3L, "b", 4L)).toDF("id", "grp", "v"), 3, del = false))
    assert(IncrementalAgg.maintainLatest(src, agg, groups, sums) == 2L)
    assert(IncrementalAgg.appliedSeq(agg).contains(2L))
    assert(maintained(agg) == recompute(src))
    // already current: no new commit on the aggregate
    val commitsBefore = agg.history().size
    assert(IncrementalAgg.maintainLatest(src, agg, groups, sums) == 2L)
    assert(agg.history().size == commitsBefore,
      "a current aggregate must not commit on catch-up")
  }

  test("min/max: adds fold via least/greatest; retracting an extreme recomputes only dirty groups") {
    val meas = graft.operators.Measures(sums = Map("v" -> col("v")),
      mins = Map("lo" -> col("v")), maxs = Map("hi" -> col("v")))
    def recomputeAll(src: GraftTable) =
      src.readUser().groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("v"),
        min("v").as("lo"), max("v").as("hi"))
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def maintainedAll(agg: GraftTable) =
      agg.readUser().select("grp", "n", "v", "lo", "hi")
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L),
      (4L, "b", 5L)).toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, meas, 0L)
    assert(maintainedAll(agg) == recomputeAll(src))

    // seq 1: a new below-min value folds in (clean path); b's only row
    // moves 5→7, retracting b's stored min AND max (dirty recompute)
    src.upsert(meta(Seq((5L, "a", 1L), (4L, "b", 7L)).toDF("id", "grp", "v"),
      2, del = false))
    IncrementalAgg.maintain(src, agg, groups, meas, 0L, 1L)
    assert(maintainedAll(agg) == recomputeAll(src), "after commit 1")
    assert(maintainedAll(agg).find(_._1 == "a").get._4 == 1L)
    assert(maintainedAll(agg).find(_._1 == "b").get == (("b", 1L, 7L, 7L, 7L)))

    // seq 2: delete a's UNIQUE min (1) → min must CLIMB back to 10
    // (pure retraction, only recompute can know); delete ONE of the
    // duplicated maxes (20) → max must STAY 20 (multiplicity!)
    src.upsert(meta(Seq((5L, "a", 1L), (3L, "a", 20L)).toDF("id", "grp", "v"),
      3, del = true))
    IncrementalAgg.maintain(src, agg, groups, meas, 1L, 2L)
    assert(maintainedAll(agg) == recomputeAll(src), "after commit 2")
    assert(maintainedAll(agg).find(_._1 == "a").get == (("a", 2L, 30L, 10L, 20L)))
  }

  test("applying a one-group delta rewrites only that group's file neighborhood") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    // tiny target bytes on the AGG side force one file per few groups,
    // so a single-group delta must leave most agg files carried
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 32)
    val wide = (1 to 400).map(i => (i.toLong, f"g$i%03d", i.toLong))
    src.bulkInsert(meta(wide.toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
    val aggFiles = agg.history().last.files.size
    assert(aggFiles > 4, s"fixture needs a multi-file aggregate (got $aggFiles)")
    // one source row moves inside ONE group
    src.upsert(meta(Seq((1L, "g001", 500L)).toDF("id", "grp", "v"), 2, del = false))
    IncrementalAgg.maintain(src, agg, groups, sums, 0L, 1L)
    val c = agg.history().last
    assert(c.extra("files_rewritten").toInt < aggFiles / 2,
      s"one-group delta rewrote ${c.extra("files_rewritten")} of $aggFiles agg files")
    assert(maintained(agg) == recompute(src))
  }

  test("cascading views: a rollup OVER an aggregate maintains through both change feeds") {
    // source (id → grp, sub, v) → view A keyed (grp, sub) with per-
    // subgroup sums → view B keyed grp rolling A up (n = live
    // subgroups, vv = sum of subgroup sums). A is an ordinary
    // GraftTable, so B needs nothing special: each level's maintenance
    // commit IS the next level's change feed.
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val a = new GraftTable(spark, tmp(), Seq("grp", "sub"), targetFileBytes = 16 * 1024)
    val b = new GraftTable(spark, tmp(), Seq("grp"), targetFileBytes = 16 * 1024)
    val measA = graft.operators.Measures(sums = Map("v" -> col("v")))
    val measB = graft.operators.Measures(sums = Map("vv" -> col("v")))
    src.bulkInsert(meta(Seq((1L, "x", "s1", 1L), (2L, "x", "s2", 2L),
      (3L, "y", "s1", 4L)).toDF("id", "grp", "sub", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, a, Seq("grp", "sub"), measA, 0L)
    IncrementalAgg.bootstrap(a, b, Seq("grp"), measB,
      a.latestCommit().get.seq)
    def recomputeB() = a.readUser().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("vv"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    def maintainedB() = b.readUser().select("grp", "n", "vv")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(maintainedB() == recomputeB())
    // one commit: y gains a NEW subgroup, x/s1 moves value, z appears,
    // and x/s2 is deleted (a vanished subgroup retracts from B)
    src.upsert(meta(Seq((4L, "y", "s9", 8L), (1L, "x", "s1", 10L),
      (5L, "z", "s1", 16L)).toDF("id", "grp", "sub", "v"), 2, del = false)
      .unionByName(meta(Seq((2L, "x", "s2", 2L)).toDF("id", "grp", "sub", "v"),
        2, del = true)))
    IncrementalAgg.maintainLatest(src, a, Seq("grp", "sub"), measA)
    IncrementalAgg.maintainLatest(a, b, Seq("grp"), measB)
    assert(maintainedB() == recomputeB(), s"cascade after commit: ${maintainedB()}")
    assert(maintainedB() == Seq(("x", 1L, 10L), ("y", 2L, 12L), ("z", 1L, 16L)))
  }

  test("refreshCascade refreshes a stale parent before the rollup in one call") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "x", "s1", 1L), (2L, "x", "s2", 2L),
      (3L, "y", "s1", 4L)).toDF("id", "grp", "sub", "v"), 1, del = false))
    val a = IncrementalAgg.create(spark, src, tmp() + "/a",
      Seq("grp", "sub"), Seq("v" -> "v"))
    val b = IncrementalAgg.create(spark, a, tmp() + "/b",
      Seq("grp"), Seq("vv" -> "v", "subs" -> "n"))
    // two source commits land; NEITHER view refreshed yet
    src.upsert(meta(Seq((4L, "y", "s9", 8L), (1L, "x", "s1", 10L))
      .toDF("id", "grp", "sub", "v"), 2, del = false))
    src.upsert(meta(Seq((5L, "z", "s1", 16L)).toDF("id", "grp", "sub", "v"),
      3, del = false)
      .unionByName(meta(Seq((2L, "x", "s2", 2L)).toDF("id", "grp", "sub", "v"),
        3, del = true)))
    val levels = IncrementalAgg.refreshCascade(spark, b)
    assert(levels.size == 2 && levels.head._1 == a.root && levels(1)._1 == b.root,
      s"parents must refresh first: $levels")
    val expectB = a.readUser().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("vv"), sum("n").as("subs"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val gotB = b.readUser().select("grp", "n", "vv", "subs")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotB == expectB, s"rollup diverged: $gotB vs $expectB")
    assert(gotB == Seq(("x", 1L, 10L, 1L), ("y", 2L, 12L, 2L), ("z", 1L, 16L, 1L)))
    // a second cascade is an idempotent no-op on every level
    val again = IncrementalAgg.refreshCascade(spark, b)
    assert(again.forall { case (_, f, t) => f == t }, s"not a no-op: $again")
  }

  test("re-applying an already-applied window refuses instead of double-counting") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L)).toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
    src.upsert(meta(Seq((2L, "a", 5L)).toDF("id", "grp", "v"), 2, del = false))
    IncrementalAgg.maintain(src, agg, groups, sums, 0L, 1L)
    // a racing maintainer (or a caller replaying the window) must refuse
    // under the table lock, never apply the delta twice
    val e = intercept[IllegalStateException](
      IncrementalAgg.maintain(src, agg, groups, sums, 0L, 1L))
    assert(e.getMessage.contains("stale maintenance window"), e.getMessage)
    assert(maintained(agg) == recompute(src))
  }

  test("maintains over a MERGE_ON_READ source with outstanding delta logs") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024,
      tableType = GraftTable.MergeOnRead)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "grp", "v"),
      1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
    // delta-log commit (NOT compacted): the diff must merge base ⋈ logs
    src.upsert(meta(Seq((1L, "a", 11L), (3L, "c", 7L)).toDF("id", "grp", "v"),
      2, del = false))
    assert(src.latestCommit().get.logFiles.nonEmpty,
      "fixture must leave an outstanding delta log")
    IncrementalAgg.maintain(src, agg, groups, sums, 0L, 1L)
    assert(maintained(agg) == recompute(src),
      s"MOR maintenance diverged: ${maintained(agg)} vs ${recompute(src)}")
  }

  test("filtered view: rows crossing the predicate boundary add/retract exactly") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    val meas = graft.operators.Measures(sums = Map("v" -> col("v")),
      mins = Map("lo" -> col("v")))
    val where = Some("v >= 10")
    def recomputeF(src: GraftTable) =
      src.readUser().filter("v >= 10").groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("v"), min("v").as("lo"))
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def maintainedF(agg: GraftTable) =
      agg.readUser().select("grp", "n", "v", "lo")
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    src.bulkInsert(meta(Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 20L))
      .toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, meas, 0L, where = where)
    assert(maintainedF(agg) == recomputeF(src))
    assert(maintainedF(agg) == Seq(("a", 1L, 10L, 10L), ("b", 1L, 20L, 20L)),
      "bootstrap must aggregate only the predicate set")
    // seq 1: id2 ENTERS the set (5→12, group unchanged — pure add from
    // an update); id1 LEAVES it (10→3 — pure retract, ties a's min);
    // id3 moves IN-set (20→15 — retract+add, retracts b's extreme);
    // id4 inserts OUT-of-set (must never appear)
    src.upsert(meta(Seq((2L, "a", 12L), (1L, "a", 3L), (3L, "b", 15L),
      (4L, "b", 2L)).toDF("id", "grp", "v"), 2, del = false))
    IncrementalAgg.maintain(src, agg, groups, meas, 0L, 1L, where = where)
    assert(maintainedF(agg) == recomputeF(src), "after boundary crossings")
    assert(maintainedF(agg) == Seq(("a", 1L, 12L, 12L), ("b", 1L, 15L, 15L)))
    // seq 2: delete a's only in-set row → the group extinguishes FROM
    // THE FILTERED SET even though out-of-set rows remain in the source
    src.upsert(meta(Seq((2L, "a", 12L)).toDF("id", "grp", "v"), 3, del = true))
    IncrementalAgg.maintain(src, agg, groups, meas, 1L, 2L, where = where)
    assert(maintainedF(agg) == recomputeF(src))
    assert(maintainedF(agg) == Seq(("b", 1L, 15L, 15L)),
      "a group with no in-set rows must be deleted from the view")
  }

  test("CALL create_agg_view with a predicate refreshes the filtered view from its own spec") {
    graft.sql.GraftSql.install(spark)
    val base = Files.createTempDirectory("graft-ivm-sqlw")
    val src = new GraftTable(spark, s"$base/src", Seq("id"),
      targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L), (2L, "a", 5L))
      .toDF("id", "grp", "v"), 1, del = false))
    graft.sql.GraftSql.register(spark, "ivmw_src", src)
    spark.sql("CALL create_agg_view('ivmw_src', 'ivmw_v', " +
      s"'$base/agg', 'grp', 'v=v', 'v >= 10')").collect()
    // one update ENTERS the set, one LEAVES it; refresh runs from the
    // spec recorded in the view's own timeline (predicate included)
    src.upsert(meta(Seq((2L, "a", 12L), (1L, "a", 3L))
      .toDF("id", "grp", "v"), 2, del = false))
    spark.sql("CALL refresh_agg_view('ivmw_v')").collect()
    val got = spark.sql("SELECT grp, n, v FROM graft.ivmw_v")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 12L)), s"got $got")
  }

  test("AVG measures: stored sum/cnt state derives the exact average through nulls") {
    val meas = graft.operators.Measures(avgs = Map("av" -> col("v")))
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", Some(10L)), (2L, "a", None: Option[Long]),
      (3L, "b", Some(7L))).toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, meas, 0L)
    def derived() = IncrementalAgg.readView(agg, meas)
      .select("grp", "n", "av")
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    // readView hides the state pair and derives av = sum/cnt (nulls
    // excluded from BOTH, per SQL AVG)
    assert(!IncrementalAgg.readView(agg, meas).columns.contains("av_sum"))
    assert(derived() == Seq(("a", 2L, Some(10.0)), ("b", 1L, Some(7.0))))
    // null→value and value→null moves adjust sum AND cnt; a new null
    // row moves neither
    src.upsert(meta(Seq((2L, "a", Some(20L)), (3L, "b", None: Option[Long]),
      (4L, "a", None: Option[Long])).toDF("id", "grp", "v"), 2, del = false))
    IncrementalAgg.maintain(src, agg, groups, meas, 0L, 1L)
    assert(derived() == Seq(("a", 3L, Some(15.0)), ("b", 1L, None)),
      s"got ${derived()}")
  }

  test("COUNT DISTINCT: extinguishing vs non-extinguishing deletes; aux lifecycle") {
    val meas = graft.operators.Measures(dcounts = Map("dv" -> col("c")))
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 6L),
      (4L, "b", 9L)).toDF("id", "grp", "c"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, meas, 0L)
    def distincts() = agg.readUser().select("grp", "n", "dv")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    def auxState() = IncrementalAgg.auxTable(spark, agg, groups, "dv")
      .readUser().select("grp", IncrementalAgg.DvCol, IncrementalAgg.CntCol)
      .as[(String, String, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(distincts() == Seq(("a", 3L, 2L), ("b", 1L, 1L)))
    assert(auxState() == Seq(("a", "5", 2L), ("a", "6", 1L), ("b", "9", 1L)))
    // seq 1: delete ONE of the two value-5 rows — count drops, the
    // value survives, distinct count must NOT move
    src.upsert(meta(Seq((1L, "a", 5L)).toDF("id", "grp", "c"), 2, del = true))
    IncrementalAgg.maintain(src, agg, groups, meas, 0L, 1L)
    assert(distincts() == Seq(("a", 2L, 2L), ("b", 1L, 1L)),
      "a non-extinguishing delete must keep the distinct count")
    assert(auxState() == Seq(("a", "5", 1L), ("a", "6", 1L), ("b", "9", 1L)))
    // seq 2: delete the LAST value-5 row (extinguishes 5) and move
    // id3's value 6→7 (extinguishes 6, births 7): distinct stays via
    // birth+death, the value SET rotates entirely
    src.upsert(meta(Seq((3L, "a", 7L)).toDF("id", "grp", "c"), 3, del = false)
      .unionByName(meta(Seq((2L, "a", 5L)).toDF("id", "grp", "c"), 3, del = true)))
    IncrementalAgg.maintain(src, agg, groups, meas, 1L, 2L)
    assert(distincts() == Seq(("a", 1L, 1L), ("b", 1L, 1L)))
    assert(auxState() == Seq(("a", "7", 1L), ("b", "9", 1L)),
      "extinguished values must be DELETED from the aux table")
  }

  test("COUNT DISTINCT crash between aux and view commit resumes idempotently") {
    val meas = graft.operators.Measures(sums = Map("v" -> col("v")),
      dcounts = Map("dv" -> col("c")))
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L, 5L), (2L, "a", 20L, 6L))
      .toDF("id", "grp", "v", "c"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, meas, 0L)
    src.upsert(meta(Seq((3L, "a", 30L, 6L), (1L, "a", 11L, 7L))
      .toDF("id", "grp", "v", "c"), 2, del = false))
    IncrementalAgg.maintain(src, agg, groups, meas, 0L, 1L)
    val expected = agg.readUser().select("grp", "n", "v", "dv")
      .as[(String, Long, Long, Long)].collect().toSeq
    // final values {7, 6, 6} → 2 distinct (5 extinguished by the update)
    assert(expected == Seq(("a", 3L, 61L, 2L)))
    // simulate the crash: the VIEW's maintenance commit vanishes (the
    // aux table keeps its toSeq watermark) — exactly the state a crash
    // between the two commits leaves behind
    val viewSeqs = agg.history().map(_.seq)
    agg.rollback(viewSeqs.init.last)
    assert(IncrementalAgg.appliedSeq(agg).contains(0L))
    val aux = IncrementalAgg.auxTable(spark, agg, groups, "dv")
    assert(IncrementalAgg.appliedSeq(aux).contains(1L),
      "fixture: aux must be AHEAD of the rolled-back view")
    // re-running the same window must skip the aux merge (already
    // applied) and still converge the view — absolute distinct counts
    // make the resume idempotent
    IncrementalAgg.maintain(src, agg, groups, meas, 0L, 1L)
    val got = agg.readUser().select("grp", "n", "v", "dv")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"crash resume diverged: $got vs $expected")
  }

  test("NULL group values are refused loudly in bootstrap and maintain") {
    // a NULL group cannot round-trip through the keyed state merge (the
    // equi-join is null-unsafe and a string group's record key is NULL),
    // so the maintenance refuses instead of silently diverging
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, Some("a"), 10L), (2L, None: Option[String], 20L))
      .toDF("id", "grp", "v"), 1, del = false))
    val e = intercept[IllegalStateException](
      IncrementalAgg.bootstrap(src, agg, groups, sums, 0L))
    assert(e.getMessage.contains("NULL group key"), e.getMessage)

    val src2 = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg2 = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src2.bulkInsert(meta(Seq((1L, "a", 10L)).toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src2, agg2, groups, sums, 0L)
    src2.upsert(meta(Seq((2L, None: Option[String], 5L)).toDF("id", "grp", "v"),
      2, del = false))
    val e2 = intercept[IllegalStateException](
      IncrementalAgg.maintain(src2, agg2, groups, sums, 0L, 1L))
    assert(e2.getMessage.contains("NULL group key"), e2.getMessage)
    // the refusal happened BEFORE any state change: watermark and rows intact
    assert(IncrementalAgg.appliedSeq(agg2).contains(0L))
    assert(maintained(agg2) == Seq(("a", 1L, 10L)))
    // the MIN/MAX path refuses identically (it has its own state read)
    val meas = graft.operators.Measures(sums = Map("v" -> col("v")),
      mins = Map("lo" -> col("v")))
    val agg3 = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    IncrementalAgg.bootstrap(src2, agg3, groups, meas, 0L)
    val e3 = intercept[IllegalStateException](
      IncrementalAgg.maintain(src2, agg3, groups, meas, 0L, 1L))
    assert(e3.getMessage.contains("NULL group key"), e3.getMessage)
  }

  test("null measures contribute nothing; count still moves") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", Some(10L)), (2L, "a", None))
      .toDF("id", "grp", "v"), 1, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, sums, 0L)
    // the null-valued row changes value; a null-valued row arrives
    src.upsert(meta(Seq((2L, "a", Some(5L)), (3L, "a", None: Option[Long]))
      .toDF("id", "grp", "v"), 2, del = false))
    IncrementalAgg.maintain(src, agg, groups, sums, 0L, 1L)
    val got = agg.readUser().select("grp", "n", "v")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 15L)), s"got $got")
    // an ALL-NULL sum contribution (one more null-valued row) must
    // PRESERVE the stored sum, not overwrite it with NULL
    src.upsert(meta(Seq((4L, "a", None: Option[Long])).toDF("id", "grp", "v"),
      3, del = false))
    IncrementalAgg.maintain(src, agg, groups, sums, 1L, 2L)
    val got2 = agg.readUser().select("grp", "n", "v")
      .as[(String, Long, Long)].collect().toSeq
    assert(got2 == Seq(("a", 4L, 15L)),
      s"null-only delta must keep the stored sum: $got2")
  }

  test("a rolled-back source refuses maintenance instead of serving stale state") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val agg = new GraftTable(spark, tmp(), groups, targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L)).toDF("id", "grp", "v"), 1, del = false))
    src.upsert(meta(Seq((2L, "a", 20L)).toDF("id", "grp", "v"), 2, del = false))
    IncrementalAgg.bootstrap(src, agg, groups, sums, 1L)
    // the source restores to BEFORE the view's watermark: the view now
    // reflects commits that no longer exist — silent no-op would serve
    // pre-rollback state forever, so maintainLatest must refuse loudly
    src.rollback(0L)
    val e = intercept[IllegalStateException](
      IncrementalAgg.maintainLatest(src, agg, groups, sums))
    assert(e.getMessage.contains("rolled back"), e.getMessage)
  }

  test("group column names outside the identifier grammar are refused at create") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(meta(Seq((1L, "a", 10L)).toDF("id", "grp", "v"), 1, del = false))
    // the spec's GroupsKey is unescaped csv — a name carrying ',' (or
    // any non-identifier char) would mis-split on refresh, so create
    // holds group names to the measure-name grammar up front
    val e = intercept[IllegalArgumentException](IncrementalAgg.create(
      spark, src, tmp(), Seq("grp,v"), Seq("total" -> "v")))
    assert(e.getMessage.contains("bad group column name"), e.getMessage)
  }
}
