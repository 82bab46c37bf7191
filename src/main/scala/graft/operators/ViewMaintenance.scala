package graft.operators

import org.apache.spark.sql.SparkSession

/** Hands-free materialized-view freshness — the engine half of the
  * `viewMaintain` table option (see [[GraftTable]]): after a table
  * commits, walk the dependent-view closure registered against it
  * ([[GraftTable.registerDependentView]]) and refresh each view from
  * its own crash-safe watermark.
  *
  * Reference frame: the reference keeps downstream state fresh by
  * re-launching the whole pipeline on an EventBridge schedule
  * (/root/reference/templates/aws-dms-to-hudi.yaml:914-927 —
  * `rate(2 hours)`); riding freshness on the ingest commit itself is
  * the engine-native version of that contract, with the same
  * crash-consistency: a crash between the ingest commit and the view
  * refresh leaves the view CONSISTENT-STALE (its watermark still names
  * the last applied source commit), and the next commit's walk catches
  * it up — nothing is half-applied, because every refresh is one
  * atomic merge commit carrying data + watermark.
  *
  * Best-effort like the inline RLI upkeep: a failing or refusing view
  * (NULL-group refusal, rolled-back source) logs and stays stale; the
  * ingest commit that triggered the walk is already durable and is
  * never failed retroactively.
  */
private[graft] object ViewMaintenance {

  /** Dependent chains deeper than this refuse (same bound as
    * [[IncrementalAgg.refreshCascade]]). */
  val MaxDepth = 10

  /** One walk owns the whole closure: a view's refresh commit flows
    * through ITS table's commit choke point, which must not start a
    * second (recursive) walk — the outer BFS already enqueues that
    * view's own dependents. */
  private val walking = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Refresh every view registered against `table`, then (BFS) the
    * views registered against THOSE views — children always refresh
    * after their parent committed, so a rollup never reads a fresh
    * child of a stale parent (the [[IncrementalAgg.refreshCascade]]
    * ordering, arrived at from the opposite direction). */
  def refreshDependents(spark: SparkSession, table: GraftTable): Unit = {
    if (walking.get()) return
    walking.set(java.lang.Boolean.TRUE)
    try {
      val seen = scala.collection.mutable.Set[String](table.root)
      val queue = scala.collection.mutable.Queue[(String, Int)]()
      table.dependentViews().foreach(r => queue.enqueue((r, 1)))
      while (queue.nonEmpty) {
        val (root, depth) = queue.dequeue()
        if (!seen.contains(root)) {
          seen += root
          if (depth > MaxDepth)
            System.err.println(s"[graft] inline view maintenance skipped $root: " +
              s"dependent chain deeper than $MaxDepth levels (cycle?)")
          else
            try {
              val v = GraftTable.open(spark, root)
              refreshOne(spark, v)
              v.dependentViews().foreach(r => queue.enqueue((r, depth + 1)))
            } catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(s"[graft] inline view maintenance failed at " +
                  s"$root (view stays consistent-stale; the next commit's walk " +
                  s"catches up): ${e.getMessage}")
            }
        }
      }
    } finally walking.set(java.lang.Boolean.FALSE)
  }

  /** Kind dispatch over the self-describing spec in the view's own
    * timeline — the six `create`d kinds (agg view, join view, near-dup
    * dedup state, classifier-score view, segment-dedup state,
    * span-census state — the last two registered by their OUT table's
    * root). */
  private def refreshOne(spark: SparkSession, v: GraftTable): Unit = {
    if (v.historyNewestFirst().exists(_.extra.contains(IncrementalAgg.SrcRootKey)))
      IncrementalAgg.refresh(spark, v)
    else if (IncrementalJoin.specOf(v).isDefined)
      IncrementalJoin.refresh(spark, v)
    else if (graft.llm.IncrementalDedup.specOf(v).isDefined)
      graft.llm.IncrementalDedup.refresh(spark, v)
    else if (graft.llm.IncrementalClassifier.specOf(v).isDefined)
      graft.llm.IncrementalClassifier.refresh(spark, v)
    else if (v.historyNewestFirst().exists(
        _.extra.contains(graft.llm.IncrementalSegmentDedup.SrcRootKey)))
      graft.llm.IncrementalSegmentDedup.refreshAt(spark, v.root)
    else if (v.historyNewestFirst().exists(
        _.extra.contains(graft.llm.IncrementalSpanCensus.SrcRootKey)))
      graft.llm.IncrementalSpanCensus.refreshAt(spark, v.root)
    else throw new IllegalStateException(
      s"registered dependent at ${v.root} carries no view spec in its timeline")
    ()
  }
}
