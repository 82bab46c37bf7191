package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.DataFile
import graft.operators.{GraftTable, IntervalIndex}

/** File-count SCALING measurement for the upsert planner pair (round-10
  * verdict task #5): the sf0.1 bench cannot reach the interval/RLI
  * crossover (~60 files), so measure the DRIVER-SIDE planner cores on
  * synthetic manifests at 10k / 100k / 1M files and print the curve.
  *
  * What each number is:
  *  - interval walk: what [[GraftTable]]'s pruneAffected pays PER BATCH
  *    on the driver+executors — a fresh IntervalIndex.build over every
  *    manifest entry plus one stab per batch key (10k keys here).
  *  - RLI probe core: what the record-level-index planner pays per batch
  *    for the same work — a binary search over the ~64 range-bucket
  *    boundaries per key. The remaining RLI cost (bucket-shard semi-join
  *    jobs) is sized by table ROWS / bucket, not by the manifest's file
  *    count, and was measured at ~0.15 s fixed overhead in the
  *    BENCH_r10/r11 `w_upsert_interval`/`w_upsert_rli` pair.
  *
  * The measurements are PRINTED (PERF_NOTES carries the curve); the only
  * assertions are sanity-level so host-load variance can never turn a
  * measurement into a flake.
  */
class PlannerScalingSpec extends AnyFunSuite {

  private val ProbeKeys = 10000

  private def synthManifest(n: Int): Array[DataFile] = {
    // disjoint key-sorted intervals, 1000 keys per file — the layout a
    // range-partitioned bulk insert actually produces
    Array.tabulate(n) { i =>
      val lo = i.toLong * 1000
      val hi = lo + 999
      DataFile(s"data/c0/part-$i.parquet", Map.empty,
        f"$lo%019d", f"$hi%019d", 1000L, 4L * 1024 * 1024)
    }
  }

  /** MIN of `runs` — the noise-robust estimator for a CPU-bound core:
    * the full `sbt test` run shares the host with 32 executor threads,
    * where a median can still absorb a GC/load spike and flip a
    * comparison (it did, once). The minimum is the closest observable
    * to the true cost. */
  private def minMs(runs: Int)(body: => Unit): Double =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }.min

  test("interval-walk planner cost grows with manifest size; RLI probe core stays flat") {
    val rnd = new scala.util.Random(42)
    val results = Seq(10000, 100000, 1000000).map { n =>
      val files = synthManifest(n)
      val keys = Array.fill(ProbeKeys)(
        f"${rnd.nextLong(n.toLong * 1000).max(0)}%019d")

      // per-batch interval planner: fresh index build + one stab per key
      var admitted = 0
      val intervalMs = minMs(5) {
        val idx = IntervalIndex.build(
          files.map(f => (f.minKey, f.maxKey, f.path)).toSeq)
        admitted = keys.map(k => idx.stab(k).size).sum
      }

      // RLI planner driver core: boundary probe per key (boundaries are
      // loaded from the index sidecar meta, built once per COMMIT, not
      // per batch — their build cost is charged to the write that
      // maintains the index, so it is excluded here)
      val boundaries = GraftTable.rliBoundaries(files.toSeq,
        GraftTable.DefaultRliBuckets)
      var buckets = 0
      val rliMs = minMs(5) {
        buckets = keys.map(k => GraftTable.rliRangeBucket(k, boundaries)).sum
      }

      // BUCKET-index planner core: hash every probe key (md5, driver
      // side) + one pass over the manifest's partition maps — no index
      // build, no per-key stab; cost is a flat O(N) set-membership scan
      val bucketFiles = files.zipWithIndex.map { case (f, i) =>
        f.copy(partition = Map(GraftTable.BucketCol -> (i % 64).toString))
      }
      var kept = 0
      val bucketMs = minMs(5) {
        val touched = keys.map(k => GraftTable.bucketOfKey(k, 64).toString).toSet
        kept = bucketFiles.count(f =>
          f.partition.get(GraftTable.BucketCol).forall(touched))
      }
      info(f"files=$n%7d  interval_walk=${intervalMs}%9.2f ms   " +
        f"rli_probe_core=${rliMs}%6.3f ms   bucket_filter=${bucketMs}%7.3f ms   " +
        f"(stab admissions=$admitted, bucketSum=$buckets, bucketKept=$kept)")
      (n, intervalMs, rliMs)
    }

    // sanity only (the PRINTED curve is the deliverable): the interval
    // walk must grow with N — 100× the entries is strictly more work —
    // and the probe core's BEST observation must undercut the 1M-file
    // interval walk (µs-scale vs hundreds of ms; a host-load inversion
    // of these mins would mean the measurement itself is garbage)
    val byN = results.map { case (n, i, _) => n -> i }.toMap
    assert(byN(1000000) > byN(10000),
      s"interval planner cost must grow with the manifest: $results")
    assert(results.map(_._3).min < results.last._2,
      s"the RLI probe core must undercut the 1M-file interval walk: $results")
  }
}
