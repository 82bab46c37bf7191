package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Meta
import graft.operators.GraftTable

/** Shared commit/observability plumbing for the three-table IVM states
  * ([[IncrementalSpanCensus]], [[IncrementalSegmentDedup]]): the aux
  * tables (inverted posting, document-frequency) are keyed by md5 hashes,
  * so a wave's keys scatter uniformly over the key space and a COW merge
  * admits — and rewrites — nearly every base file: a corpus-proportional
  * write per KB-scale wave (measured: `merge_post` 2.4–2.9 s of the
  * 8 s `w_incr_span` line at sf0.1). The fix is the band-store treatment
  * ([[IncrementalDedup]]'s `commitBands`): MERGE_ON_READ aux tables
  * append ONE tombstone-carrying wave-sized delta log per commit, reads
  * merge latest-wins, and every Nth commit folds the logs (the
  * corpus-proportional write paid 1/N'th per wave instead of 1× per
  * wave). COPY_ON_WRITE aux tables (pre-upgrade states, spec fixtures)
  * keep the locked merge unchanged.
  */
private[graft] object IvmAux {

  /** How many aux delta commits between inline compactions — the same
    * amortization knob as the dedup band store's. */
  val AuxCompactEvery = 8

  /** Land one aux-table wave delta. MOR: tombstone upsert (delete rows
    * ride [[Meta.Deleted]], latest-wins by the monotonic `toSeq`
    * ordering stamp — bit-equivalent to the merge after read-time
    * resolution). COW: the original locked merge. Both carry the
    * caller's watermark metadata and stale-window guard. */
  def commitAux(t: GraftTable, delta: DataFrame, delFlag: Column,
      whenMatchedSet: Map[String, Column], delSrc: Column, insSrc: Column,
      toSeq: Long, extraMeta: Map[String, String],
      guard: Option[() => Unit]): Unit = {
    if (t.tableType == GraftTable.MergeOnRead) {
      t.upsert(delta
          .withColumn(Meta.Deleted, delFlag)
          .withColumn(Meta.Ordering, lit(f"$toSeq%020d")),
        extraMeta = extraMeta, preCommit = guard)
    } else {
      t.mergeInto(delta,
        whenMatchedSet = whenMatchedSet,
        whenMatchedDelete = Some(delSrc),
        insertWhenNotMatched = true,
        insertWhenNotMatchedCond = Some(insSrc),
        extraMeta = extraMeta, preCommit = guard)
    }
    ()
  }

  /** Session flag: dump each wave's merge-delta physical plans (the
    * plans/rNN evidence hook — explain("formatted") of exactly the
    * frames the commits consume). */
  val ExplainKey = "graft.ivm.explainDeltas"

  def dumpPlan(tag: String, df: DataFrame): Unit =
    if (df.sparkSession.conf.getOption(ExplainKey).contains("true"))
      println(s"=== plan: $tag ===\n" + df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

  /** `limit(cap+1).collect()` — Some(rows) iff the frame fits the cap
    * (the [[IncrementalDedup.DriverWaveCap]] collect discipline). */
  def collectCapped(df: DataFrame,
      cap: Int): Option[Array[org.apache.spark.sql.Row]] = {
    val rows = df.limit(cap + 1).collect()
    if (rows.length > cap) None else Some(rows)
  }

  /** A wave's collected (sh, id) postings and changed-id sets — the
    * driver wave path's one shared collection (None over the cap; the
    * postings are narrow: one md5 string + one long per row). */
  private[llm] final case class Wave(a: Array[(String, Long)],
      b: Array[(String, Long)], afterIds: Set[Long], delIds: Set[Long]) {
    lazy val changed: Set[Long] = afterIds ++ delIds
  }

  def collectWave(img: DataFrame, after: DataFrame, distB: DataFrame,
      distA: DataFrame, idCol: String, cap: Int): Option[Wave] =
    for {
      a <- collectCapped(distA.select(col("sh"), col("id")), cap)
      b <- collectCapped(distB.select(col("sh"), col("id")), cap)
      aft <- collectCapped(after.select(col("id")).distinct(), cap)
      del <- collectCapped(img.filter(col("op") === "D")
        .select(col("_before")(idCol).cast("long").as("id")).distinct(), cap)
    } yield Wave(
      a.map(r => (r.getString(0), r.getLong(1))),
      b.map(r => (r.getString(0), r.getLong(1))),
      aft.map(_.getLong(0)).toSet, del.map(_.getLong(0)).toSet)

  /** Driver-side stored-df lookup: point reads under `fetchCap`, one
    * isin-filtered columnar scan above it (no join either way). */
  def storedDfLocal(df: GraftTable, hashes: Seq[String],
      fetchCap: Int): Map[String, Long] = {
    if (hashes.isEmpty) return Map.empty
    val rows =
      if (hashes.size <= fetchCap) df.readKeys(hashes)
      else df.readUser().filter(col("sh").isin(hashes: _*))
    rows.select(col("sh"), col("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Driver-side posting lookup: per-hash composite-key range reads
    * under `rangeCap` legs, one isin-filtered scan above it; collected
    * under `cap` (the crossing-posting volume is wave-proportional by
    * the df algebra — a hash's df only crosses the duplicate boundary
    * by the wave's own signed contribution). */
  def postingsLocal(post: GraftTable, hashes: Seq[String], rangeCap: Int,
      cap: Int): Option[Array[(String, Long)]] = {
    if (hashes.isEmpty) return Some(Array.empty)
    // grouped multi-range read: ONE scan over the union of the per-hash
    // admitted files (the per-leg union paid a plan + a job per hash —
    // ~10 s of fixed overhead at the 256-leg cap); the isin residual
    // keeps the result exact
    val frame =
      if (hashes.size <= rangeCap)
        post.readKeyRanges(hashes.map(h =>
            (s"sh:$h,id:0000000000000000000", s"sh:$h,id:9999999999999999999")))
          .filter(col("sh").isin(hashes: _*))
      else post.readUser().filter(col("sh").isin(hashes: _*))
    collectCapped(frame.select(col("sh"), col("id")), cap)
      .map(_.map(r => (r.getString(0), r.getLong(1))))
  }

  /** The signed-delta fold shared by the driver paths: per-hash add/rem
    * counts from the collected postings, stored df joined in, the
    * (old, new) move map — throws the caller's re-bootstrap error on a
    * negative count. */
  def movedLocal(dfTable: GraftTable, w: Wave, fetchCap: Int,
      negativeMsg: => String): Map[String, (Long, Long)] = {
    val addCnt = w.a.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val remCnt = w.b.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // sorted: deterministic readKeys/isin plans across replays
    val deltaHashes = (addCnt.keySet ++ remCnt.keySet).toSeq.sorted
    val stored = storedDfLocal(dfTable, deltaHashes, fetchCap)
    val moved: Map[String, (Long, Long)] = deltaHashes.iterator.map { sh =>
      val old = stored.getOrElse(sh, 0L)
      sh -> (old, old + addCnt.getOrElse(sh, 0L) - remCnt.getOrElse(sh, 0L))
    }.toMap
    if (moved.valuesIterator.exists(_._2 < 0))
      throw new IllegalStateException(negativeMsg)
    moved
  }

  /** The posting-table delta of a collected wave: leavers (one = 0) and
    * enterers (one = 1) as a LocalRelation. */
  def postDeltaLocal(spark0: org.apache.spark.sql.SparkSession,
      w: Wave): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val aSet = w.a.toSet
    val bSet = w.b.toSet
    val rows =
      w.b.iterator.filterNot(aSet).map { case (sh, id) => Row(sh, id, 0L) } ++
        w.a.iterator.filterNot(bSet).map { case (sh, id) => Row(sh, id, 1L) }
    spark0.createDataFrame(rows.toSeq.asJava,
      StructType(Seq(StructField("sh", StringType, nullable = true),
        StructField("id", LongType, nullable = false),
        StructField("one", LongType, nullable = false))))
  }

  /** A move map as the distributed frames' (sh, _old, _new) shape —
    * LocalRelation stand-in for the pinned `moved` frame. */
  def movedFrameLocal(spark0: org.apache.spark.sql.SparkSession,
      moved: Map[String, (Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark0.createDataFrame(
      moved.iterator.map { case (sh, (o, nw)) => Row(sh, o, nw) }.toSeq.asJava,
      StructType(Seq(StructField("sh", StringType, nullable = true),
        StructField("_old", LongType, nullable = false),
        StructField("_new", LongType, nullable = false))))
  }

  /** A collected id set as a one-column (id) LocalRelation. */
  def idsFrameLocal(spark0: org.apache.spark.sql.SparkSession,
      ids: Seq[Long]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark0.createDataFrame(ids.map(Row(_)).asJava,
      StructType(Seq(StructField("id", LongType, nullable = false))))
  }

  /** The df-table delta of a move map: rows whose count changed, new
    * value carried (0 = delete), as a LocalRelation. */
  def dfDeltaLocal(spark0: org.apache.spark.sql.SparkSession,
      moved: Map[String, (Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = moved.iterator.collect {
      case (sh, (o, nw)) if nw != o => Row(sh, nw)
    }
    spark0.createDataFrame(rows.toSeq.asJava,
      StructType(Seq(StructField("sh", StringType, nullable = true),
        StructField("df", LongType, nullable = false))))
  }
}
