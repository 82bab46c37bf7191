package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism repair for explode-heavy passes over SMALL scans.
  *
  * A corpus that fits in one parquet split (one ~600 KB documents file
  * at bench scale) schedules its whole scan on 1–2 tasks — and a
  * following `explode` multiplies the work 50–100× WITHOUT adding
  * tasks, so a 32-core box runs a 90 MB suffix/shingle fan-out on one
  * core (measured: the suffix census spent 3–6 s in single-task stages;
  * the optimization guide §2.5 calls this input skew and prescribes a
  * repartition straight after the read).
  *
  * [[widen]] inserts that repartition ONLY when the optimizer's size
  * estimate says the scan is too small to produce enough splits — the
  * gate makes it scale-adaptive: at real corpus scale the inputs carry
  * hundreds of splits, the gate never fires, and no exchange is added.
  * The round-robin shuffle it inserts at bench scale is bounded by the
  * gate (≤ ~4 MB × parallelism of PRE-explode bytes).
  */
object Fan {
  /** Per-core input-bytes threshold below which a fan-out source is
    * widened; 4 MB of pre-explode text is ~a quarter-split of
    * post-explode work per core at the suffix census's ~60× blowup. */
  val WidenBytesPerCore: Long = 4L * 1024 * 1024

  def widen(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    // only PURE FILE-SCAN frames are widened: an IVM wave's pinned
    // (InMemoryRelation) or driver-assembled (LocalRelation) frames are
    // KB-scale by design and an extra exchange would only add a fixed
    // cost to every wave — the parallelism hole this repairs is the
    // one-split parquet SCAN
    val leaves = plan.collectLeaves()
    val allFileScans = leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation])
    val bytes = plan.stats.sizeInBytes
    if (allFileScans && bytes.isValidLong &&
        bytes.toLong < WidenBytesPerCore * dp)
      df.repartition(dp)
    else df
  }
}
