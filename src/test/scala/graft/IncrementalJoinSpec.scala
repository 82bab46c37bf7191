package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.{GraftTable, IncrementalJoin}

/** Incremental join-view maintenance: the materialized fact⋈dim table
  * must equal a full re-join of the two source snapshots after every
  * window — through fact inserts/updates/deletes, FK MIGRATION, dim
  * updates (fan-out), dim deletes (fan-out), LATE dims (fan-in), and
  * windows where both sides move at once, including a fact row whose
  * dim changed in the same window (the branch-overlap case). */
class IncrementalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-ivmj").toString

  private def meta(df: org.apache.spark.sql.DataFrame, seq: Int, del: Boolean) =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(del))

  private val on = Seq("fk" -> "dk")

  private def mkLeft(rows: Seq[(Long, Option[Long], String)], seq: Int): GraftTable = {
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(meta(rows.toDF("id", "fk", "lv"), seq, del = false))
    t
  }
  private def mkRight(rows: Seq[(Long, String)], seq: Int): GraftTable = {
    val t = new GraftTable(spark, tmp(), Seq("dk"), targetFileBytes = 16 * 1024)
    t.bulkInsert(meta(rows.toDF("dk", "dv"), seq, del = false))
    t
  }
  private def mkView(): GraftTable =
    new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)

  private def recompute(l: GraftTable, r: GraftTable) = {
    val lf = l.readUser(); val rf = r.readUser()
    lf.join(rf, lf("fk") === rf("dk"), "inner")
      .select(lf("id"), lf("fk"), lf("lv"), rf("dv"))
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
  }
  private def materialized(v: GraftTable) =
    v.readUser().select("id", "fk", "lv", "dv")
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq

  test("fact-side changes: insert, update, delete, FK migration, dangling FK") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(10L), "b"),
      (3L, Some(20L), "c"), (4L, None, "n"), (5L, Some(99L), "x")), 1)
    val right = mkRight(Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty")), 1)
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)
    assert(materialized(view) == recompute(left, right))
    // a NULL fk and a dangling fk (99) contribute no view row
    assert(materialized(view).map(_._1) == Seq(1L, 2L, 3L))

    // update in place, MIGRATE 2's fk 10→30, delete 3, insert 6,
    // update 5 to a STILL-dangling fk (stays absent), point 4 at 20
    left.upsert(meta(Seq((1L, Some(10L), "a2"), (2L, Some(30L), "b"),
      (5L, Some(98L), "x"), (4L, Some(20L), "n2"), (6L, Some(20L), "f"))
      .toDF("id", "fk", "lv"), 2, del = false)
      .unionByName(meta(Seq((3L, Some(20L), "c")).toDF("id", "fk", "lv"),
        2, del = true)))
    IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 0L, 0L)
    assert(materialized(view) == recompute(left, right), "after fact window")
    assert(materialized(view).map(_._1) == Seq(1L, 2L, 4L, 6L))
  }

  test("dim-side changes: update fan-out, delete fan-out, late-dim fan-in") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(10L), "b"),
      (3L, Some(20L), "c"), (4L, Some(40L), "waiting")), 1)
    val right = mkRight(Seq((10L, "ten"), (20L, "twenty")), 1)
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)
    assert(materialized(view).map(_._1) == Seq(1L, 2L, 3L))

    // dim 10 renames (fans over rows 1 AND 2), dim 20 dies (row 3
    // retracts), dim 40 ARRIVES LATE (row 4 fans in)
    right.upsert(meta(Seq((10L, "TEN"), (40L, "forty")).toDF("dk", "dv"),
      2, del = false)
      .unionByName(meta(Seq((20L, "twenty")).toDF("dk", "dv"), 2, del = true)))
    IncrementalJoin.maintain(left, right, view, on, 0L, 0L, 0L, 1L)
    assert(materialized(view) == recompute(left, right), "after dim window")
    assert(materialized(view) == Seq((1L, 10L, "a", "TEN"),
      (2L, 10L, "b", "TEN"), (4L, 40L, "waiting", "forty")))
  }

  test("both sides move in one window, including the branch-overlap cases") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b"),
      (3L, Some(20L), "c")), 1)
    val right = mkRight(Seq((10L, "ten"), (20L, "twenty")), 1)
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)

    // OVERLAP 1: row 1 updates AND its dim 10 updates — branch 1 must
    // see the NEW dim value (right@rightTo), branch 2 must skip key 1.
    // OVERLAP 2: row 4 inserts pointing at dim 50 which ALSO inserts
    // this window — branch 1 owns it; the late-fact branch must not
    // duplicate it. Plus row 5 inserts waiting on nothing (dangling),
    // row 2 deletes, dim 20 updates (fans over remaining row 3 only).
    left.upsert(meta(Seq((1L, Some(10L), "a9"), (4L, Some(50L), "d"),
      (5L, Some(77L), "e")).toDF("id", "fk", "lv"), 2, del = false)
      .unionByName(meta(Seq((2L, Some(20L), "b")).toDF("id", "fk", "lv"),
        2, del = true)))
    right.upsert(meta(Seq((10L, "TEN"), (20L, "TWENTY"), (50L, "fifty"))
      .toDF("dk", "dv"), 2, del = false))
    IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 0L, 1L)
    assert(materialized(view) == recompute(left, right), "after joint window")
    assert(materialized(view) == Seq((1L, 10L, "a9", "TEN"),
      (3L, 20L, "c", "TWENTY"), (4L, 50L, "d", "fifty")))
  }

  test("windows compose: (0,1]+(1,2] on both sides equals (0,2]") {
    def scenario(): (GraftTable, GraftTable) = {
      val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b")), 1)
      val right = mkRight(Seq((10L, "t"), (20L, "w")), 1)
      left.upsert(meta(Seq((1L, Some(20L), "a2"), (3L, Some(10L), "c"))
        .toDF("id", "fk", "lv"), 2, del = false))
      right.upsert(meta(Seq((10L, "T2")).toDF("dk", "dv"), 2, del = false))
      left.upsert(meta(Seq((2L, Some(20L), "b")).toDF("id", "fk", "lv"),
        3, del = true))
      right.upsert(meta(Seq((30L, "x")).toDF("dk", "dv"), 3, del = false)
        .unionByName(meta(Seq((20L, "w")).toDF("dk", "dv"), 3, del = true)))
      (left, right)
    }
    val (l1, r1) = scenario()
    val stepped = mkView()
    IncrementalJoin.bootstrap(l1, r1, stepped, on, 0L, 0L)
    IncrementalJoin.maintain(l1, r1, stepped, on, 0L, 1L, 0L, 1L)
    IncrementalJoin.maintain(l1, r1, stepped, on, 1L, 2L, 1L, 2L)
    val (l2, r2) = scenario()
    val oneShot = mkView()
    IncrementalJoin.bootstrap(l2, r2, oneShot, on, 0L, 0L)
    IncrementalJoin.maintain(l2, r2, oneShot, on, 0L, 2L, 0L, 2L)
    assert(materialized(stepped) == materialized(oneShot))
    assert(materialized(stepped) == recompute(l1, r1))
  }

  test("maintainLatest: watermark resume, idempotent no-op, stale-window refusal") {
    val left = mkLeft(Seq((1L, Some(10L), "a")), 1)
    val right = mkRight(Seq((10L, "t")), 1)
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)
    left.upsert(meta(Seq((2L, Some(10L), "b")).toDF("id", "fk", "lv"),
      2, del = false))
    assert(IncrementalJoin.maintainLatest(left, right, view, on) == ((1L, 0L)))
    assert(IncrementalJoin.appliedSeqs(view) == Some((1L, 0L)))
    // current view: catch-up is a pure no-op (no new commit)
    val commits = view.history().size
    assert(IncrementalJoin.maintainLatest(left, right, view, on) == ((1L, 0L)))
    assert(view.history().size == commits)
    assert(materialized(view) == recompute(left, right))
    // re-applying an already-applied window refuses under the lock
    val e = intercept[IllegalStateException](
      IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 0L, 0L))
    assert(e.getMessage.contains("stale join maintenance window"), e.getMessage)
  }

  test("two racing maintainers: exactly one applies, the loser refuses under the lock") {
    val left = mkLeft(Seq((1L, Some(10L), "a")), 1)
    val right = mkRight(Seq((10L, "t")), 1)
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)
    left.upsert(meta(Seq((2L, Some(10L), "b")).toDF("id", "fk", "lv"),
      2, del = false))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val start = new java.util.concurrent.CountDownLatch(1)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.await()
          // the view's table lock serializes the merges; the loser's
          // preCommit re-reads the watermark UNDER the lock and refuses
          // instead of double-applying the same window
          try IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 0L, 0L)
          catch { case _: IllegalStateException => refusals.incrementAndGet(); () }
        }
      })
    }
    start.countDown()
    tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(refusals.get() == 1, s"exactly one refusal, got ${refusals.get()}")
    assert(IncrementalJoin.appliedSeqs(view) == Some((1L, 0L)))
    assert(materialized(view) == recompute(left, right))
  }

  test("a rolled-back source (either side) refuses maintenance loudly") {
    val left = mkLeft(Seq((1L, Some(10L), "a")), 1)
    val right = mkRight(Seq((10L, "t")), 1)
    left.upsert(meta(Seq((2L, Some(10L), "b")).toDF("id", "fk", "lv"),
      2, del = false))
    right.upsert(meta(Seq((20L, "w")).toDF("dk", "dv"), 2, del = false))
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 1L, 1L)
    right.rollback(0L)
    val e = intercept[IllegalStateException](
      IncrementalJoin.maintainLatest(left, right, view, on))
    assert(e.getMessage.contains("right head 0 is BELOW"), e.getMessage)
    left.rollback(0L)
    val e2 = intercept[IllegalStateException](
      IncrementalJoin.maintainLatest(left, right, view, on))
    assert(e2.getMessage.contains("left head 0 is BELOW"), e2.getMessage)
  }

  test("contract refusals: right not keyed by join columns; name collisions") {
    val left = mkLeft(Seq((1L, Some(10L), "a")), 1)
    val right = mkRight(Seq((10L, "t")), 1)
    // right keyed by dk but joined on a different column layout
    intercept[IllegalArgumentException](IncrementalJoin.bootstrap(
      left, right, mkView(), Seq("fk" -> "dv"), 0L, 0L))
    // view keyed differently from left
    val badView = new GraftTable(spark, tmp(), Seq("fk"))
    intercept[IllegalArgumentException](IncrementalJoin.bootstrap(
      left, right, badView, on, 0L, 0L))
    // non-join column name shared by both sides
    val rClash = new GraftTable(spark, tmp(), Seq("dk"), targetFileBytes = 16 * 1024)
    rClash.bulkInsert(meta(Seq((10L, "t")).toDF("dk", "lv"), 1, del = false))
    val e = intercept[IllegalArgumentException](IncrementalJoin.bootstrap(
      left, rClash, mkView(), on, 0L, 0L))
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("create records the spec; refresh maintains from the view alone") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b")), 1)
    val right = mkRight(Seq((10L, "t"), (20L, "w")), 1)
    val view = IncrementalJoin.create(spark, left, right, tmp(), on)
    assert(materialized(view) == recompute(left, right))
    left.upsert(meta(Seq((3L, Some(20L), "c")).toDF("id", "fk", "lv"),
      2, del = false))
    right.upsert(meta(Seq((10L, "T")).toDF("dk", "dv"), 2, del = false))
    val ((lf, lt), (rf, rt)) = IncrementalJoin.refresh(spark, view)
    assert((lf, lt) == ((0L, 1L)) && ((rf, rt)) == ((0L, 1L)))
    assert(materialized(view) == recompute(left, right))
    // the spec is re-stamped into maintenance commits: refresh again
    // after archiving would still find it (here: just assert presence
    // on the newest commit)
    val newest = view.historyNewestFirst().next()
    assert(newest.extra.contains(IncrementalJoin.OnKey))
  }

  test("a maintenance-only source window advances the watermark with no data change") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b")), 1)
    val right = mkRight(Seq((10L, "t"), (20L, "w")), 1)
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)
    val before = materialized(view)
    // cluster() commits on the source but its change feed is EMPTY —
    // the window must still land (ranges compose through it) and the
    // view's rows must be untouched
    left.cluster()
    right.cluster()
    assert(IncrementalJoin.maintainLatest(left, right, view, on) == ((1L, 1L)))
    assert(IncrementalJoin.appliedSeqs(view) == Some((1L, 1L)))
    assert(materialized(view) == before)
    assert(materialized(view) == recompute(left, right))
  }

  private def recomputeLeft(l: GraftTable, r: GraftTable) = {
    val lf = l.readUser(); val rf = r.readUser()
    lf.join(rf, lf("fk") === rf("dk"), "left")
      .select(lf("id"), lf("fk"), lf("lv"), rf("dv"))
      .as[(Long, Option[Long], String, Option[String])].collect().sortBy(_._1).toSeq
  }
  private def materializedLeft(v: GraftTable) =
    v.readUser().select("id", "fk", "lv", "dv")
      .as[(Long, Option[Long], String, Option[String])].collect().sortBy(_._1).toSeq

  test("LEFT OUTER view: facts survive missing dims; dim ops rewrite in place") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(40L), "waiting"),
      (3L, None, "nofk"), (4L, Some(20L), "d")), 1)
    val right = mkRight(Seq((10L, "ten"), (20L, "twenty")), 1)
    val view = mkView()
    val L = IncrementalJoin.LeftOuter
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L, L)
    // EVERY fact row is present; 2 and 3 carry NULL dim columns
    assert(materializedLeft(view) == recomputeLeft(left, right))
    assert(materializedLeft(view).map(_._1) == Seq(1L, 2L, 3L, 4L))

    // dim-only window: 40 arrives (row 2 fills IN PLACE), 10 renames
    // (row 1 rewrites), 20 dies (row 4 NULLs out instead of vanishing)
    right.upsert(meta(Seq((40L, "forty"), (10L, "TEN")).toDF("dk", "dv"),
      2, del = false)
      .unionByName(meta(Seq((20L, "twenty")).toDF("dk", "dv"), 2, del = true)))
    IncrementalJoin.maintain(left, right, view, on, 0L, 0L, 0L, 1L, L)
    assert(materializedLeft(view) == recomputeLeft(left, right), "after dim window")
    assert(materializedLeft(view) == Seq(
      (1L, Some(10L), "a", Some("TEN")), (2L, Some(40L), "waiting", Some("forty")),
      (3L, None, "nofk", None), (4L, Some(20L), "d", None)))

    // both-sides window: row 3 gains a DANGLING fk (stays, dim NULL),
    // row 1 deletes, row 5 inserts pointing at 40, dim 40 updates in
    // the same window (branch overlap: both rows 2 and 5 must read the
    // NEW value — 2 via fan-out, 5 via branch 1 against right@to)
    left.upsert(meta(Seq((3L, Some(99L), "nofk"), (5L, Some(40L), "e"))
      .toDF("id", "fk", "lv"), 3, del = false)
      .unionByName(meta(Seq((1L, Some(10L), "a")).toDF("id", "fk", "lv"),
        3, del = true)))
    right.upsert(meta(Seq((40L, "FORTY")).toDF("dk", "dv"), 3, del = false))
    IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 1L, 2L, L)
    assert(materializedLeft(view) == recomputeLeft(left, right), "after joint window")
    assert(materializedLeft(view) == Seq(
      (2L, Some(40L), "waiting", Some("FORTY")), (3L, Some(99L), "nofk", None),
      (4L, Some(20L), "d", None), (5L, Some(40L), "e", Some("FORTY"))))
  }

  test("LEFT OUTER create/refresh round-trips the join type through the spec") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(77L), "b")), 1)
    val right = mkRight(Seq((10L, "t")), 1)
    val view = IncrementalJoin.create(spark, left, right, tmp(), on,
      IncrementalJoin.LeftOuter)
    assert(materializedLeft(view) == recomputeLeft(left, right))
    // the dangling row is IN the LEFT view from bootstrap
    assert(materializedLeft(view).map(_._1) == Seq(1L, 2L))
    left.upsert(meta(Seq((3L, Some(10L), "c")).toDF("id", "fk", "lv"),
      2, del = false))
    right.upsert(meta(Seq((77L, "late")).toDF("dk", "dv"), 2, del = false))
    IncrementalJoin.refresh(spark, view)
    assert(materializedLeft(view) == recomputeLeft(left, right))
    assert(materializedLeft(view)(1) == ((2L, Some(77L), "b", Some("late"))))
    assert(view.historyNewestFirst().next()
      .extra(IncrementalJoin.JoinTypeKey) == IncrementalJoin.LeftOuter)
  }

  test("filtered view: facts crossing the predicate boundary add/retract exactly") {
    // the view is `facts WHERE lv <> 'x' ⋈ dim` — the predicate rides
    // a column the updates move, so rows cross in both directions
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(10L), "x"),
      (3L, Some(20L), "c")), 1)
    val right = mkRight(Seq((10L, "ten"), (20L, "twenty")), 1)
    val view = mkView()
    val where = Some("lv <> 'x'")
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L,
      IncrementalJoin.Inner, where = where)
    // row 2 is outside the set from bootstrap
    assert(materialized(view).map(_._1) == Seq(1L, 3L))
    // row 1 LEAVES the set (update to 'x'), row 2 ENTERS it, row 4
    // inserts outside it, row 3 updates within it
    left.upsert(meta(Seq((1L, Some(10L), "x"), (2L, Some(10L), "b"),
      (3L, Some(20L), "c2"), (4L, Some(20L), "x")).toDF("id", "fk", "lv"),
      2, del = false))
    IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 0L, 0L,
      IncrementalJoin.Inner, where = where)
    assert(materialized(view) == Seq((2L, 10L, "b", "ten"),
      (3L, 20L, "c2", "twenty")), materialized(view).toString)
    // a LATE dim must fan in only the facts INSIDE the predicate set
    left.upsert(meta(Seq((5L, Some(40L), "e"), (6L, Some(40L), "x"))
      .toDF("id", "fk", "lv"), 3, del = false))
    right.upsert(meta(Seq((40L, "forty")).toDF("dk", "dv"), 2, del = false))
    IncrementalJoin.maintain(left, right, view, on, 1L, 2L, 0L, 1L,
      IncrementalJoin.Inner, where = where)
    assert(materialized(view) == Seq((2L, 10L, "b", "ten"),
      (3L, 20L, "c2", "twenty"), (5L, 40L, "e", "forty")),
      materialized(view).toString)
    // LEFT OUTER composes with the predicate: outside-the-set rows are
    // absent entirely, inside-the-set rows survive a missing dim
    val lview = mkView()
    IncrementalJoin.bootstrap(left, right, lview, on, 2L, 1L,
      IncrementalJoin.LeftOuter, where = where)
    val lgot = materializedLeft(lview)
    assert(lgot.map(_._1) == Seq(2L, 3L, 5L), lgot.toString)
  }

  test("projected dim columns: the view carries only the requested columns") {
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b")), 1)
    // a WIDE dim: dv is wanted, junk is not
    val right = new GraftTable(spark, tmp(), Seq("dk"), targetFileBytes = 16 * 1024)
    right.bulkInsert(meta(Seq((10L, "ten", "J1"), (20L, "twenty", "J2"))
      .toDF("dk", "dv", "junk"), 1, del = false))
    val view = IncrementalJoin.create(spark, left, right, tmp(), on,
      rightCols = Seq("dv"))
    assert(!view.readUser().columns.contains("junk"),
      "the view must not materialize unrequested dim columns")
    assert(materialized(view) == Seq((1L, 10L, "a", "ten"),
      (2L, 20L, "b", "twenty")))
    // a dim update touching BOTH columns flows through only on dv —
    // maintain derives the kept set from the view's own schema
    right.upsert(meta(Seq((10L, "TEN", "J9")).toDF("dk", "dv", "junk"),
      2, del = false))
    IncrementalJoin.refresh(spark, view)
    assert(materialized(view) == Seq((1L, 10L, "a", "TEN"),
      (2L, 20L, "b", "twenty")))
  }

  test("maintains over MERGE_ON_READ sources with outstanding delta logs") {
    val left = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024,
      tableType = GraftTable.MergeOnRead)
    left.bulkInsert(meta(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b"))
      .toDF("id", "fk", "lv"), 1, del = false))
    val right = new GraftTable(spark, tmp(), Seq("dk"), targetFileBytes = 16 * 1024,
      tableType = GraftTable.MergeOnRead)
    right.bulkInsert(meta(Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dv"),
      1, del = false))
    val view = mkView()
    IncrementalJoin.bootstrap(left, right, view, on, 0L, 0L)
    // delta-log commits on BOTH sides (NOT compacted): the diffs and
    // the snapshot reads must merge base ⋈ logs
    left.upsert(meta(Seq((1L, Some(20L), "a2"), (3L, Some(10L), "c"))
      .toDF("id", "fk", "lv"), 2, del = false))
    right.upsert(meta(Seq((10L, "TEN")).toDF("dk", "dv"), 2, del = false))
    assert(left.latestCommit().get.logFiles.nonEmpty &&
      right.latestCommit().get.logFiles.nonEmpty,
      "fixture must leave outstanding delta logs")
    IncrementalJoin.maintain(left, right, view, on, 0L, 1L, 0L, 1L)
    assert(materialized(view) == recompute(left, right),
      s"MOR maintenance diverged: ${materialized(view)}")
  }

  test("STAR chain: a join view OVER a join view enriches with two dims in one cascade") {
    // fact(id, fk, lv) ⋈ dim1(dk, dv, nk) → level 1; level1 ⋈ dim2(nk2, nv)
    // on the FIRST dim's carried column — the snowflake shape. One
    // refresh on level 2 must walk level 1 (both base feeds) first.
    val fact = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(20L), "b")), 1)
    val dim1 = new GraftTable(spark, tmp(), Seq("dk"), targetFileBytes = 16 * 1024)
    dim1.bulkInsert(meta(Seq((10L, "ten", 100L), (20L, "twenty", 200L))
      .toDF("dk", "dv", "nk"), 1, del = false))
    val dim2 = new GraftTable(spark, tmp(), Seq("nk2"), targetFileBytes = 16 * 1024)
    dim2.bulkInsert(meta(Seq((100L, "EU"), (200L, "US")).toDF("nk2", "nv"),
      1, del = false))
    val l1 = IncrementalJoin.create(spark, fact, dim1, tmp(), Seq("fk" -> "dk"))
    val l2 = IncrementalJoin.create(spark, l1, dim2, tmp(), Seq("nk" -> "nk2"))
    def snap() = l2.readUser().select("id", "lv", "dv", "nv")
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    assert(snap() == Seq((1L, "a", "ten", "EU"), (2L, "b", "twenty", "US")))
    // churn at EVERY level: a fact insert, a dim1 re-point (20 moves to
    // nation 100), a dim2 rename — ONE cascade on level 2 sees all
    fact.upsert(meta(Seq((3L, Some(20L), "c")).toDF("id", "fk", "lv"),
      2, del = false))
    dim1.upsert(meta(Seq((20L, "TWENTY", 100L)).toDF("dk", "dv", "nk"),
      2, del = false))
    dim2.upsert(meta(Seq((100L, "EUROPE")).toDF("nk2", "nv"), 2, del = false))
    val levels = graft.operators.IncrementalAgg.refreshCascade(spark, l2)
    assert(levels.size == 2 && levels.head._1 == l1.root, levels.toString)
    assert(snap() == Seq((1L, "a", "ten", "EUROPE"),
      (2L, "b", "TWENTY", "EUROPE"), (3L, "c", "TWENTY", "EUROPE")),
      snap().toString)
  }

  test("an aggregate view OVER a join view cascades through both kinds") {
    import graft.operators.IncrementalAgg
    val left = mkLeft(Seq((1L, Some(10L), "a"), (2L, Some(10L), "b"),
      (3L, Some(20L), "c")), 1)
    val right = mkRight(Seq((10L, "ten"), (20L, "twenty")), 1)
    val join = IncrementalJoin.create(spark, left, right, tmp(), on)
    // rollup over the ENRICHMENT: per-dim-value live row count — its
    // source change feed is the join view's own maintenance commits
    val agg = IncrementalAgg.create(spark, join, tmp(), Seq("dv"),
      Seq("rows" -> "1"))
    // churn on BOTH base tables; neither view refreshed yet
    left.upsert(meta(Seq((4L, Some(20L), "d")).toDF("id", "fk", "lv"),
      2, del = false))
    right.upsert(meta(Seq((10L, "TEN")).toDF("dk", "dv"), 2, del = false))
    // ONE cascade on the AGG walks: join view first (both base feeds),
    // then the agg over the join view's fresh maintenance commit
    val levels = IncrementalAgg.refreshCascade(spark, agg)
    assert(levels.size == 2 && levels.head._1 == join.root, levels.toString)
    val got = agg.readUser().select("dv", "n", "rows")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("TEN", 2L, 2L), ("twenty", 2L, 2L)), s"got $got")
    assert(materialized(join) == recompute(left, right))
  }
}
