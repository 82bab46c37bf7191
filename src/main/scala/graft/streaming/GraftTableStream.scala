package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, GenericInternalRow, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.model.DataFile
import graft.operators.GraftTable

/** Streaming read of a graft table through the DSv2 catalog —
  * `spark.readStream.table("graft.<name>")` (the Hudi/Delta streaming-
  * source analog, round-10 verdict "What's missing" #3 made native).
  *
  * Offsets ARE commit seqs: the timeline is already a totally-ordered,
  * atomically-published log, so the stream needs no state of its own —
  * batch (start, end] is planned straight off the manifests.
  *
  *  - **Initial batch** (fresh checkpoint): the full snapshot file set at
  *    the current tip — Delta's "snapshot then changes" contract.
  *  - **Incremental batches**: files ADDED by ingest commits in the
  *    window ([[GraftTable.changeFilesBetween]]) — change-exact on MOR
  *    delta logs, affected-region on COW; maintenance rewrites never
  *    re-feed. At-least-once per key VERSION — a latest-wins consumer
  *    (e.g. a downstream [[graft.operators.GraftTable.upsert]]) is
  *    exactly-once end to end, the same contract as [[IncrementalFeed]].
  *  - **Checkpoint resume**: Spark's own offset log replays the last
  *    committed seq into [[GraftMicroBatchStream.deserializeOffset]];
  *    nothing is re-delivered after a clean restart.
  *
  * Scale: planning is driver-side manifest metadata (O(commits) per
  * batch); each admitted file becomes one InputPartition read by Spark's
  * own parquet reader machinery on executors — no row ever passes
  * through the driver. Column pruning flows from the scan builder's
  * pruned schema; partition-column values are injected from the MANIFEST
  * (no directory inference).
  */
class GraftMicroBatchStream(table: GraftTable, streamSchema: StructType,
    startFrom: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val spark = SparkSession.active

  private def tip: Long = table.latestCommit().map(_.seq).getOrElse(-1L)

  // Trigger.AvailableNow contract: pin the tip at preparation so the
  // run drains exactly the commits that existed at start, then stops —
  // a concurrent writer cannot keep the drain alive forever
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(tip)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latestOffset()
  override def reportLatestOffset(): Offset = GraftStreamOffset(tip)

  /** Fresh-checkpoint start: −1 (snapshot-then-changes) unless the
    * stream was opened with `startingVersion` — then the named commit
    * seq, so the first batch is exactly the post-seq changes (the
    * consumer declares it already holds the state as of that commit).
    * Only consulted on a fresh checkpoint; resume replays Spark's own
    * offset log. Starting past the tip is legal (the stream idles until
    * commits pass it); archived history still plans (the window walks
    * `readIncludingArchived`), though files a cleaner already removed
    * fail loudly at read time, as any too-old consumer must. */
  override def initialOffset(): Offset =
    GraftStreamOffset(startFrom.getOrElse(-1L))

  override def latestOffset(): Offset =
    GraftStreamOffset(availableNowTarget.getOrElse(tip))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].seq
    val e = end.asInstanceOf[GraftStreamOffset].seq
    if (e <= s || e < 0) return Array.empty
    val files: Seq[DataFile] =
      if (s < 0) table.snapshotFilesAt(e) // fresh stream: snapshot-then-changes
      else table.changeFilesBetween(s, e)
    val partSchema = partitionSchema
    files.zipWithIndex.map { case (f, i) =>
      val values: Array[Any] = partSchema.fields.map { pf =>
        f.partition.get(pf.name) match {
          case Some(raw) if raw != GraftTable.NullPartition =>
            castPartValue(raw, pf.dataType)
          case _ => null
        }
      }
      val abs = s"${table.root}/${f.path}"
      val len = if (f.bytes > 0) f.bytes else java.nio.file.Files.size(java.nio.file.Paths.get(abs))
      GraftFilePartition(abs, len, values, i): InputPartition
    }.toArray
  }

  /** Partition columns present in the pruned output schema — their
    * values come from the manifest, not the files. */
  private def partitionSchema: StructType =
    StructType(streamSchema.filter(f => table.partitionFields.contains(f.name)))

  private def castPartValue(raw: String, dt: DataType): Any =
    Cast(Literal(UTF8String.fromString(raw), StringType), dt, Some("UTC")).eval()

  override def createReaderFactory(): PartitionReaderFactory = {
    val partSchema = partitionSchema
    val dataSchema = StructType(streamSchema.filterNot(f => partSchema.fieldNames.contains(f.name)))
    // Spark's own (vectorized, pushdown-capable) parquet reader, built
    // once on the driver as a serializable per-file function — the same
    // machinery FileSourceScanExec ships to executors
    val readFn = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = dataSchema,
      partitionSchema = partSchema,
      requiredSchema = dataSchema,
      filters = Seq.empty,
      // rows, not ColumnarBatch: the PartitionReader surfaces
      // InternalRow (vectorization still applies inside the reader)
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConf())
    // the reader appends partition columns AFTER the data columns;
    // re-order to the declared stream schema
    val combined = StructType(dataSchema.fields ++ partSchema.fields)
    val order = streamSchema.fields.map(f => combined.fieldIndex(f.name))
    new GraftStreamReaderFactory(readFn, combined, order)
  }
}

/** Offset = the highest commit seq this batch has consumed (inclusive);
  * -1 = nothing yet (the next batch delivers the snapshot). */
case class GraftStreamOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** One snapshot/change file = one partition; `partValues` are catalyst
  * values for the manifest-recorded hive partition columns. */
case class GraftFilePartition(path: String, length: Long,
    partValues: Array[Any], index: Int) extends InputPartition

private[streaming] class GraftStreamReaderFactory(
    readFn: PartitionedFile => Iterator[InternalRow],
    combined: StructType,
    order: Array[Int]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftFilePartition]
    val pf = PartitionedFile(
      partitionValues = new GenericInternalRow(gp.partValues),
      filePath = SparkPath.fromPathString(gp.path),
      start = 0L,
      length = gp.length,
      locations = Array.empty,
      modificationTime = 0L,
      fileSize = gp.length,
      otherConstantMetadataColumnValues = Map.empty)
    // the parquet reader may hand back vectorized ColumnarBatch elements
    // disguised as InternalRow (the FileScanRDD contract) — unwrap both
    val rows: Iterator[InternalRow] = readFn(pf).asInstanceOf[Iterator[AnyRef]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }
    val proj = UnsafeProjection.create(
      order.map(i => BoundReference(i, combined(i).dataType, nullable = true)).toSeq)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = proj(rows.next()); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = () // reader closes on task completion
    }
  }
}
