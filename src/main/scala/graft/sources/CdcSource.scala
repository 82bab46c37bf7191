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

  /** S1 — full recursive scan (date-partition subdirs included). */
  def readRaw(spark: SparkSession, root: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("recursiveFileLookup", "true")
    schema.fold(r)(r.schema).parquet(root)
  }

  /** Watermark = `<mtimeMillis>/<path>` of the newest file already
    * ingested; ordering is (mtime, path) so files that share a
    * modification timestamp are still totally ordered and none is skipped
    * or double-read.
    */
  def encodeWatermark(mtime: Long, path: String): String = s"$mtime/$path"

  def decodeWatermark(w: String): (Long, String) = {
    val i = w.indexOf('/')
    (w.substring(0, i).toLong, w.substring(i + 1))
  }

  /** Recursive listing of data files under `root`, sorted by (mtime, path). */
  def listDataFiles(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    val out = Seq.newBuilder[(Long, String)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith("."))
        out += ((st.getModificationTime, fs.makeQualified(st.getPath).toString))
    }
    out.result().sorted
  }

  /** S2 — incremental read: files strictly after `checkpoint` in
    * (mtime, path) order. Returns None when the zone has no new files (a
    * delta run then commits nothing — the no-op cycle the reference's
    * 2-hour schedule produces most of the time).
    */
  def readIncremental(spark: SparkSession, root: String, checkpoint: Option[String],
      schema: Option[StructType] = None): Option[(DataFrame, String)] = {
    val all = listDataFiles(spark, root)
    val fresh = checkpoint match {
      case None => all
      case Some(w) =>
        val wm = decodeWatermark(w)
        val ord = Ordering.Tuple2[Long, String]
        all.filter(f => ord.compare(f, wm) > 0)
    }
    if (fresh.isEmpty) None
    else {
      val (mt, pth) = fresh.last
      val r = spark.read
      val df = schema.fold(r)(r.schema).parquet(fresh.map(_._2): _*)
      Some((df, encodeWatermark(mt, pth)))
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
}
