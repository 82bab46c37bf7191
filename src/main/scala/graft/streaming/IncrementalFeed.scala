package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame
import graft.operators.GraftTable

/** LIVE incremental-pull consumer — the downstream half of pipeline
  * chaining (reference handler.py chains pipelines batch-wise; Hudi's
  * DeltaStreamer runs this same loop against an upstream Hudi table as a
  * source). A poll loop watches the table's commit timeline and emits
  * exactly the rows ADDED by commits in (consumedSeq, tip] via
  * [[GraftTable.readChangesBetween]] — manifest metadata decides what to
  * read, so a poll with nothing new costs one directory listing, never a
  * data job.
  *
  * Delivery contract: the consumed seq is persisted (atomic tmp+rename)
  * AFTER the callback returns, so a crash between emit and checkpoint
  * re-delivers that batch — at-least-once into an idempotent sink (e.g. a
  * keyed [[GraftTable]] upsert, the same latest-wins absorption the ingest
  * side relies on) is exactly-once end to end.
  *
  * Maintenance commits (cluster / compact) rewrite existing rows into new
  * files; a change feed must NOT re-emit them, so those actions advance
  * the checkpoint without emitting.
  */
object IncrementalFeed {

  final class Handle private[IncrementalFeed] (thread: Thread,
      @volatile private[IncrementalFeed] var consumed: Long,
      @volatile private[IncrementalFeed] var failure: Option[Throwable]) {
    private[IncrementalFeed] val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    /** Highest commit seq whose rows the callback has fully processed. */
    def consumedSeq: Long = consumed
    /** Re-throws a callback/poll failure on the caller thread. */
    def checkFailed(): Unit = failure.foreach(e => throw e)
    def stop(): Unit = { stopFlag.set(true); thread.interrupt(); thread.join(30000) }
  }

  private def readCheckpoint(ck: Path, startSeq: Long): Long =
    if (Files.exists(ck)) Files.readString(ck).trim.toLong else startSeq

  private def writeCheckpoint(ck: Path, seq: Long): Unit = {
    val tmp = ck.resolveSibling(s".${ck.getFileName}.tmp")
    Files.write(tmp, seq.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ck, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Start the poll loop. `startSeq` is EXCLUSIVE (the consumer's
    * bootstrap snapshot ends there; the feed delivers what comes after) —
    * ignored when `checkpoint` already records progress. The callback
    * receives (changes, fromSeqExclusive, toSeqInclusive).
    */
  def start(table: GraftTable, checkpoint: Path, startSeq: Long = 0L,
      pollMs: Long = 1000L)(onBatch: (DataFrame, Long, Long) => Unit): Handle = {
    val seed = readCheckpoint(checkpoint, startSeq)
    var handle: Handle = null
    val t = new Thread(() => {
      try {
        while (!handle.stopFlag.get()) {
          val last = handle.consumed
          table.latestCommit() match {
            case Some(tip) if tip.seq > last =>
              // emit only ingest actions; cluster/compact rewrites carry
              // no new row versions and must not re-feed downstream.
              // Bounded history: only the (last, tip] manifests are read —
              // a poll never re-materializes the whole timeline
              val history = table.history(last, tip.seq)
              val emitFrom = last
              val emitTo = tip.seq
              val ingest = history.filterNot(c =>
                c.action == "cluster" || c.action == "compact")
              if (ingest.nonEmpty) {
                // change-exact rows: union of per-ingest-commit additions
                // (a single bounded pull over the whole window would also
                // include files a maintenance commit rewrote)
                val parts = ingest.map(c =>
                  table.readChangesBetween(c.seq - 1, c.seq))
                onBatch(parts.reduce(_.unionByName(_, allowMissingColumns = true)),
                  emitFrom, emitTo)
              }
              writeCheckpoint(checkpoint, emitTo)
              handle.consumed = emitTo
            case _ => ()
          }
          try Thread.sleep(pollMs)
          catch { case _: InterruptedException => () } // stop() wake-up
        }
      } catch {
        case e: Throwable if !handle.stopFlag.get() =>
          handle.failure = Some(e)
        case _: Throwable => ()
      }
    }, s"graft-incremental-feed-${table.root.hashCode}")
    handle = new Handle(t, seed, None)
    t.setDaemon(true)
    t.start()
    handle
  }
}
