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
  private val stages = scala.collection.mutable.ListBuffer[java.nio.file.Path]()

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(PinSet.ReliableKey).contains("true")) {
      if (stages.isEmpty) PinSet.sweepStale(stageRoot)
      val dir = java.nio.file.Paths.get(stageRoot,
        s"pin-${java.util.UUID.randomUUID().toString.take(12)}")
      df.write.parquet(dir.toString)
      stages += dir
      // explicit schema: a zero-row frame writes no data files, and the
      // original nullability must survive the round trip
      spark.read.schema(df.schema).parquet(dir.toString)
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
    stages.foreach { d =>
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(d))
        scala.util.Using.resource(java.nio.file.Files.walk(d)) { s =>
          s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().asScala.foreach(p =>
              scala.util.Try(java.nio.file.Files.deleteIfExists(p)))
        }
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
    val base = java.nio.file.Paths.get(stageRoot)
    if (!java.nio.file.Files.isDirectory(base)) return
    import scala.jdk.CollectionConverters._
    val cutoff = System.currentTimeMillis() - StaleMs
    scala.util.Using.resource(java.nio.file.Files.list(base)) { s =>
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("pin-"))
        .filter(d => scala.util.Try(java.nio.file.Files
          .getLastModifiedTime(d).toMillis < cutoff).getOrElse(false))
        .foreach { d =>
          scala.util.Using.resource(java.nio.file.Files.walk(d)) { w =>
            w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .iterator().asScala.foreach(p =>
                scala.util.Try(java.nio.file.Files.deleteIfExists(p)))
          }
        }
    }
  }
}
