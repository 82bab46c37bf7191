package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1/S2 — the raw-CDC-zone reader. The reference points DeltaStreamer's
  * ParquetDFSSource at `raw/<identifier>/<schema>/<table>/` and relies on
  * its commit-checkpoint to read only new files on each delta run
  * (handler.py:70,88-93,141). Spark-native: recursive parquet scan for the
  * full zone; for incremental runs, a driver-side recursive listing
  * filtered by a (mtime, path) watermark persisted in the table's commit
  * metadata — the read itself stays a plain pushdown-capable parquet scan
  * over the selected files.
  */
object CdcSource {

  /** S1 — full recursive scan (date-partition subdirs included).
    * Event-time encodings are normalized AT THIS BOUNDARY
    * ([[graft.util.TsNorm]]): a DMS-style feed can ship
    * `isAdjustedToUTC=false` (TIMESTAMP_NTZ) or nanos timestamps, and
    * every downstream merge/watermark/`unix_micros` plan assumes
    * `TimestampType`. */
  def readRaw(spark: SparkSession, root: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("recursiveFileLookup", "true")
    graft.util.TsNorm.normalize(schema.fold(r)(r.schema).parquet(root))
  }

  /** S1 variant — ORC zone: the other columnar lake format, read through
    * Spark's native (pushdown-capable, vectorized) ORC source with the
    * same recursive layout and boundary normalization as the parquet
    * zone. ORC's own TIMESTAMP is timezone-naive — Spark surfaces it per
    * `spark.sql.orc.ntz` semantics, and [[graft.util.TsNorm]] lands
    * either reading as `TimestampType`. */
  def readOrc(spark: SparkSession, root: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("recursiveFileLookup", "true")
    // nanosLong = false: ORC has no parquet-style TIMESTAMP(NANOS)-as-
    // BIGINT encoding, so a genuine long column named like a timestamp
    // must NOT be reinterpreted (the nanos rule is parquet-only)
    graft.util.TsNorm.normalize(schema.fold(r)(r.schema).orc(root), nanosLong = false)
  }

  /** S1 variant — JSON-lines zone (`*.jsonl` / `*.jsonl.gz`), the
    * canonical LLM corpus interchange format: one JSON object per line,
    * usually gzip-compressed per shard. Spark's text source decodes the
    * codec transparently per file. Stated honestly for 100 TB: gzip is
    * NOT splittable, so parallelism is per FILE — which is how these
    * corpora ship (a crawl dump is tens of thousands of shards); the
    * schema is REQUIRED — inference would read every shard twice before
    * the first real job. */
  def readJsonl(spark: SparkSession, root: String, schema: StructType): DataFrame =
    graft.util.TsNorm.normalize(
      spark.read.schema(schema).option("recursiveFileLookup", "true").json(root),
      nanosLong = false) // text zones never carry parquet-NANOS longs

  /** S1 variant — CSV zone (DMS's DEFAULT S3 target format; the reference
    * pipeline opts into parquet, but a stock DMS endpoint emits CSV).
    * Same codec/splittability/schema notes as [[readJsonl]]. */
  def readCsv(spark: SparkSession, root: String, schema: StructType,
      header: Boolean = true): DataFrame =
    graft.util.TsNorm.normalize(
      spark.read.schema(schema).option("recursiveFileLookup", "true")
        .option("header", header.toString).csv(root),
      nanosLong = false) // text zones never carry parquet-NANOS longs

  /** Watermark = the max ingested mtime PLUS the set of paths already
    * processed at exactly that mtime. A later arrival sharing the boundary
    * timestamp (coarse mtime granularity on many filesystems/object
    * stores) is therefore still picked up — a plain (mtime, path) cursor
    * would skip a same-tick file whose path sorts below the cursor.
    * The set is bounded by files-per-tick, not zone size.
    */
  def encodeWatermark(mtime: Long, pathsAtMtime: Seq[String]): String =
    (mtime.toString +: pathsAtMtime.sorted).mkString("\n")

  def decodeWatermark(w: String): (Long, Set[String]) = {
    val lines = w.split("\n", -1)
    // legacy single-line "<mtime>/<path>" cursor from earlier releases
    if (lines.length == 1 && lines.head.contains('/')) {
      val i = lines.head.indexOf('/')
      (lines.head.substring(0, i).toLong, Set(lines.head.substring(i + 1)))
    } else (lines.head.toLong, lines.tail.toSet)
  }

  /** Zones with more first-level entries than this list DISTRIBUTED:
    * a single-threaded driver walk over a 1M-file object-store zone is
    * the classic ingest stall (every date-partition dir is a sequential
    * round trip); above the threshold the per-subdirectory walks fan out
    * as Spark tasks. Below it, the driver walk wins — no job overhead. */
  val DistributedListThreshold = 64

  /** Recursive listing of data files under `root`, sorted by (mtime,
    * path). `suffix` selects the zone format; its gzipped form
    * (`<suffix>.gz`) always counts too — compressed JSONL/CSV zones ship
    * that way. Wide zones (> [[DistributedListThreshold]] first-level
    * entries — the DMS date-partition layout after a few months) listed
    * in parallel across the cluster; the result still lands driver-side
    * because the (mtime, path) watermark is driver state, and it is
    * bounded by the file COUNT, not data size. */
  def listDataFiles(spark: SparkSession, root: String,
      suffix: String = ".parquet"): Seq[(Long, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    val level1 = fs.listStatus(p)
    val (dirs, files) = level1.partition(_.isDirectory)
    val keepName = mkKeep(suffix)
    val direct = files.iterator.filter(st => keepName(st.getPath.getName))
      .map(st => (st.getModificationTime, fs.makeQualified(st.getPath).toString))
      .toSeq
    val nested: Seq[(Long, String)] =
      // gate on the DIRECTORY count, not total level-1 entries: a flat
      // zone with thousands of files and no subdirs has nothing to fan
      // out (and parallelize over zero dirs would demand >=1 partition)
      if (dirs.length <= DistributedListThreshold)
        dirs.iterator.flatMap(d => walk(fs, d.getPath, keepName)).toSeq
      else {
        // distributed: each task walks one subtree with its own FS client
        val ser = new graft.util.SerConf(conf)
        val dirStrs = dirs.map(_.getPath.toString).toIndexedSeq
        spark.sparkContext
          .parallelize(dirStrs, math.max(1, math.min(dirStrs.length, 64)))
          .flatMap { d =>
            val dp = new HPath(d)
            val dfs = dp.getFileSystem(ser.value)
            walk(dfs, dp, mkKeep(suffix))
          }
          .collect().toSeq
      }
    (direct ++ nested).sorted
  }

  private def mkKeep(suffix: String): String => Boolean =
    name => (name.endsWith(suffix) || name.endsWith(suffix + ".gz")) &&
      !name.startsWith("_") && !name.startsWith(".")

  private def walk(fs: org.apache.hadoop.fs.FileSystem, p: HPath,
      keep: String => Boolean): Seq[(Long, String)] = {
    val out = Seq.newBuilder[(Long, String)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && keep(st.getPath.getName))
        out += ((st.getModificationTime, fs.makeQualified(st.getPath).toString))
    }
    out.result()
  }

  /** Next watermark after processing `fresh` files on top of `checkpoint`. */
  def advanceWatermark(checkpoint: Option[String], fresh: Seq[(Long, String)]): String = {
    val maxM = fresh.map(_._1).max
    val carried = checkpoint.map(decodeWatermark) match {
      case Some((m, done)) if m == maxM => done
      case _ => Set.empty[String]
    }
    encodeWatermark(maxM, (carried ++ fresh.filter(_._1 == maxM).map(_._2)).toSeq)
  }

  /** S2 — incremental read: files newer than the checkpoint's mtime, plus
    * unprocessed files AT the boundary mtime. Returns None when the zone
    * has no new files (a delta run then commits nothing — the no-op cycle
    * the reference's 2-hour schedule produces most of the time).
    */
  def readIncremental(spark: SparkSession, root: String, checkpoint: Option[String],
      schema: Option[StructType] = None): Option[(DataFrame, String)] = {
    val all = listDataFiles(spark, root)
    val fresh = checkpoint match {
      case None => all
      case Some(w) =>
        val (wm, done) = decodeWatermark(w)
        all.filter(f => f._1 > wm || (f._1 == wm && !done(f._2)))
    }
    if (fresh.isEmpty) None
    else {
      val r = spark.read
      val df = graft.util.TsNorm.normalize(
        schema.fold(r)(r.schema).parquet(fresh.map(_._2): _*))
      Some((df, advanceWatermark(checkpoint, fresh)))
    }
  }

}

/** S6 — JDBC full-load source: the Spark analog of the DMS full-load phase
  * (templates/aws-dms-to-hudi.yaml:295 `full-load-and-cdc`; the CDC tail
  * stays an external feed into the raw zone). Partitioned reads so the
  * load parallelizes like DMS's MaxFullLoadSubTasks=8.
  */
object JdbcSource {
  def read(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0, upperBound: Long = 1, numPartitions: Int = 8,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withPart = partitionColumn.fold(r)(c => r
      .option("partitionColumn", c)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions))
    props.foldLeft(withPart) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** INCREMENTAL pull: rows with `watermarkCol` strictly above the last
    * seen watermark — the self-serve polling complement to the
    * partitioned full load (what a DMS-less deployment runs on a cadence
    * against the source database). The predicate ships INSIDE the pushed
    * query, so the database answers from its index instead of the engine
    * filtering a full dump; batches are deltas by construction, so the
    * single-partition read is the right shape (the partitioned reader
    * stays the full-load path). Feed the result to `GraftTable.upsert`
    * and record the new high watermark in the commit checkpoint — the
    * same exactly-once loop the file-based incremental source uses.
    * `table`/`watermarkCol` are interpolated into the pushed query after
    * validation against a conservative identifier grammar (optionally
    * schema-qualified bare identifiers, or fully double-quoted parts —
    * the caller supplies any dialect-specific quoting inside the quotes):
    * a user-influenced identifier can otherwise smuggle SQL into the
    * SOURCE database. */
  def readIncremental(spark: SparkSession, url: String, table: String,
      watermarkCol: String, lastWatermark: Long,
      props: Map[String, String] = Map.empty): DataFrame = {
    def checkIdent(what: String, s: String): Unit = {
      val part = """([A-Za-z_][A-Za-z0-9_$]*|"[^"\\;]+")"""
      require(s.matches(s"$part(\\.$part)*"),
        s"$what is not a safe SQL identifier: $s " +
          "(use bare or double-quoted dot-qualified parts)")
    }
    checkIdent("table", table)
    checkIdent("watermarkCol", watermarkCol)
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query",
        s"SELECT * FROM $table WHERE $watermarkCol > $lastWatermark")
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }
}
