package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraftTable, IncrementalAgg, IncrementalJoin}

/** Hands-free view freshness — the `viewMaintain` table option: every
  * locked commit on the source refreshes the views registered against
  * it (and, transitively, theirs), with the rliMaintain failure
  * contract (best-effort, never fails the ingest) and the crash-window
  * contract (a commit that dies before the refresh leaves the view
  * consistent-stale; the next commit catches up from the view's own
  * watermark). */
class ViewMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-vm").toString

  test("a viewMaintain source refreshes its agg view on every commit — zero CALLs") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    src.bulkInsert(Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "g", "v"))
    val view = IncrementalAgg.create(spark, src, tmp(), Seq("g"),
      Seq("total" -> "v"))
    src.upsert(Seq((3L, "x", 5L)).toDF("id", "g", "v"))
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(1L),
      "the ingest commit itself must bring the view forward")
    val got = view.readUser().select(col("g"), col("n"), col("total"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("x", 2L, 15L), ("y", 1L, 20L)))
    // a second commit keeps it current — including deletes
    src.upsert(Seq((2L, "y", 20L)).toDF("id", "g", "v")
      .withColumn(graft.model.Meta.Deleted, lit(true)))
    assert(view.readUser().filter(col("g") === "y").count() == 0)
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(2L))
  }

  test("crash window: a maintenance-less commit stays consistent-stale; the next catches up") {
    val root = tmp()
    val srcOn = new GraftTable(spark, root, Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    val srcOff = new GraftTable(spark, root, Seq("id"),
      targetFileBytes = 16 * 1024)
    srcOn.bulkInsert(Seq((1L, "x", 10L)).toDF("id", "g", "v"))
    val view = IncrementalAgg.create(spark, srcOn, tmp(), Seq("g"),
      Seq("total" -> "v"))
    // the simulated crash between ingest and refresh: the commit lands
    // through a handle with maintenance off — the view must not move
    // (and must still be a CONSISTENT snapshot of commit 0)
    srcOff.upsert(Seq((2L, "x", 7L)).toDF("id", "g", "v"))
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(0L))
    assert(view.readUser().select(col("total")).as[Long].head() == 10L)
    // the next maintained commit walks BOTH windows forward atomically
    srcOn.upsert(Seq((3L, "x", 3L)).toDF("id", "g", "v"))
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(2L))
    assert(view.readUser().select(col("total")).as[Long].head() == 20L)
  }

  test("join views refresh when EITHER source commits; chains walk parent-then-child") {
    val left = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    left.bulkInsert(Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "fk", "lv"))
    val right = new GraftTable(spark, tmp(), Seq("fk"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    right.bulkInsert(Seq((10L, "d1")).toDF("fk", "rv"))
    val jv = IncrementalJoin.create(spark, left, right, tmp(),
      Seq("fk" -> "fk"))
    // a CHILD aggregate over the join view: the walk must reach it
    // transitively (join view refreshed by the base commit, then the
    // child from the join view's fresh maintenance commit)
    val child = IncrementalAgg.create(spark, jv, tmp(), Seq("rv"),
      Seq("total" -> "fk"))
    // dim-side commit: late dim fans order 2 in, join view + child follow
    right.upsert(Seq((20L, "d2")).toDF("fk", "rv"))
    assert(jv.readUser().count() == 2)
    assert(IncrementalAgg.readView(GraftTable.open(spark, child.root),
      graft.operators.Measures(sums = Map("total" -> col("fk"))))
      .filter(col("rv") === "d2").count() == 1,
      "the dependent chain must refresh transitively in one commit's walk")
    // fact-side commit: the other feed drives the same walk
    left.upsert(Seq((3L, 10L, "c")).toDF("id", "fk", "lv"))
    assert(jv.readUser().count() == 3)
  }

  test("view_maintain retunes LIVE through ALTER TABLE SET TBLPROPERTIES") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024) // maintenance OFF at creation
    src.bulkInsert(Seq((1L, "x", 10L)).toDF("id", "g", "v"))
    graft.sql.GraftSql.register(spark, "vm_sql_src", src)
    val view = IncrementalAgg.create(spark, src, tmp(), Seq("g"),
      Seq("total" -> "v"))
    // flip the knob from SQL; the catalog re-registers the retuned handle
    spark.sql(
      "ALTER TABLE graft.vm_sql_src SET TBLPROPERTIES ('view_maintain'='true')")
    spark.sql("INSERT INTO graft.vm_sql_src VALUES (2, 'x', 7)")
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(1L),
      "the SQL INSERT's commit must refresh the view through the retuned handle")
    assert(view.readUser().select(col("total")).as[Long].head() == 17L)
  }

  test("a broken view logs and stays stale — the ingest commit never fails") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true)
    src.bulkInsert(Seq((1L, "x", 10L)).toDF("id", "g", "v"))
    val view = IncrementalAgg.create(spark, src, tmp(), Seq("g"),
      Seq("total" -> "v"))
    // destroy the view's directory: the walk must log, not throw
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(view.root))
    val c = src.upsert(Seq((2L, "y", 5L)).toDF("id", "g", "v"))
    assert(c.seq == 1L, "ingest must commit despite the broken view")
    assert(src.readUser().count() == 2)
  }

  test("async mode: ingest marks durably and returns stale; drain catches up; a crashed drain heals") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, viewMaintain = true,
      viewMaintainAsync = true)
    src.bulkInsert(Seq((1L, "x", 10L)).toDF("id", "g", "v"))
    val view = IncrementalAgg.create(spark, src, tmp(), Seq("g"),
      Seq("total" -> "v"))
    // the ingest commit returns WITHOUT walking the view closure — the
    // view is consistent-stale and the pending mark is durable
    src.upsert(Seq((2L, "x", 7L)).toDF("id", "g", "v"))
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(0L),
      "async ingest must not pay the view walk")
    assert(src.viewsPending(), "the pending mark must be durable at commit time")
    assert(view.readUser().select(col("total")).as[Long].head() == 10L)
    // the drainer (CALL drain_views / the next maintainer) catches up
    assert(src.drainViews(), "drain must observe the outstanding mark")
    assert(IncrementalAgg.appliedSeq(GraftTable.open(spark, view.root)) == Some(1L))
    assert(view.readUser().select(col("total")).as[Long].head() == 17L)
    assert(!src.viewsPending(), "drain must clear the mark")
    // crash between mark and drain: a SECOND process's handle (fresh
    // open — the crashed drainer's in-memory state is gone) sees the
    // durable mark and heals
    src.upsert(Seq((3L, "x", 3L)).toDF("id", "g", "v"))
    assert(src.viewsPending())
    val reopened = GraftTable.open(spark, src.root)
    assert(reopened.viewMaintainAsync, "async mode must persist in the descriptor")
    assert(reopened.drainViews())
    assert(view.readUser().select(col("total")).as[Long].head() == 20L)
    // an idle drain is a cheap no-op (no mark, watermarks already at head)
    assert(!src.drainViews())
  }

  test("registration filenames cannot alias: distinct roots register distinctly") {
    // the pre-fix scheme concatenated two UNPADDED hex strings, so
    // distinct roots could map to one filename and silently overwrite
    // each other's registration; full-md5 names make that impossible —
    // proven here over many same-hash-prefix-shaped roots
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024)
    src.bulkInsert(Seq((1L, "x")).toDF("id", "g"))
    val roots = (0 until 64).map(i => s"/views/v$i")
    roots.foreach(src.registerDependentView)
    assert(src.dependentViews().toSet == roots.toSet,
      "every registered root must survive every other registration")
    // deregistering one removes exactly that one
    src.deregisterDependentView(roots(7))
    assert(src.dependentViews().toSet == (roots.toSet - roots(7)))
    // re-registration is idempotent (same filename, REPLACE semantics)
    src.registerDependentView(roots(8))
    assert(src.dependentViews().count(_ == roots(8)) == 1)
  }
}
