package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.util.Using

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.operators.GraftTable

/** Native DSv2 streaming WRITE into a graft table —
  * `df.writeStream.toTable("graft.t")` — the write-side complement of
  * [[GraftTableStream]] (`spark.readStream.table`). The capability bar
  * is the reference's continuous mode as a first-class surface
  * (`launch_hudi/handler.py:115-116`, `:166-167`): Hudi and Delta both
  * accept `writeStream` sinks, so a user wiring a streaming pipeline
  * from pure DataFrame surfaces reaches for this first.
  *
  * The V2 streaming protocol hands ROWS to per-partition executor
  * writers, but the engine's exactly-once contract lives in its
  * whole-batch write path (precombine → affected-file pruning → atomic
  * commit). Bridging the two is a two-phase design, the same shape
  * Hudi's DeltaStreamer uses against a raw staging zone:
  *
  *  1. **Stage** (executors, parallel): each writer spools its rows to
  *     `<table>/_graft/stream_stage/<queryId>/epoch=<n>/` in a framed
  *     binary row encoding ([[RowCodec]]) and names its file in the
  *     commit message. Zombie attempts never reach a message; their
  *     strays die with the epoch directory.
  *  2. **Commit** (driver, per epoch): the named files re-enter as a
  *     distributed DataFrame (one partition per staged file — the
  *     stage's parallelism is preserved) and run the table's own
  *     checkpointed upsert (or insert-overwrite-table under
  *     `outputMode("complete")`). A replayed epoch re-runs the SAME
  *     idempotent upsert — latest-wins absorbs it, exactly like the
  *     `foreachBatch` sink ([[ContinuousIngest.sink]]) this generalizes.
  *
  * The staging area lives under the table root deliberately: the
  * engine's storage model is ONE store for data, manifests and indexes
  * alike, so the stage inherits the table's durability and visibility
  * guarantees with no second storage system. All spool I/O rides the
  * root's [[graft.model.ObjectStore]] (resolved by root string on both
  * driver and executors), so `writeStream.toTable` works on a mounted
  * root (`graftmem:/` space, S3-shape) exactly like on a local
  * directory — the reference deployment is S3-native
  * (templates/aws-dms-to-hudi.yaml:264-269). On a dir-backed store the
  * executor spools straight to the object's file path (zero extra
  * copies, the old behavior); on a mounted store it spools to
  * EXECUTOR-LOCAL scratch and uploads in one PUT at task commit — the
  * s3a block-upload shape, so a multi-node cluster never needs shared
  * POSIX storage for the stage.
  */
private[graft] class GraftStreamingWrite(t: GraftTable, schema: StructType,
    queryId: String, overwrite: Boolean) extends StreamingWrite {
  RowCodec.validate(schema)
  private val tableRoot = t.root
  private val stagePrefix = s"_graft/stream_stage/$queryId"
  private def store = graft.model.GraftStores.forRoot(tableRoot)
  // fresh-start sweep: a crashed prior run of THIS query (same
  // checkpoint → same queryId, which Spark's checkpoint lock keeps
  // single-flight) may have left spooled epochs behind; uncommitted
  // epochs re-stage on replay and committed epochs already deleted
  // theirs, so anything here is garbage. A PERMANENTLY abandoned
  // query's stage therefore dies on its next start; one never restarted
  // surfaces through fsck, which counts stage files older than the
  // liveness grace as orphans.
  store.deletePrefix(stagePrefix + "/")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStageWriterFactory(tableRoot, stagePrefix, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val keys = messages.collect {
      case StagedFileMessage(k) if k != null && k.nonEmpty => k }.toSeq
    val spark = SparkSession.active
    if (keys.nonEmpty) {
      val sch = schema
      val root = tableRoot
      // the staged objects re-enter as a distributed read — one
      // partition per spool object, each executor resolving the store
      // by root string (never a serialized handle)
      val rows = spark.sparkContext.parallelize(keys, keys.size)
        .flatMap(k => RowCodec.readAll(
          graft.model.GraftStores.forRoot(root).openStream(k), sch))
      val df = spark.createDataFrame(rows, sch)
      if (overwrite) t.insertOverwriteTable(df)
      else t.upsert(df, Some(s"stream-epoch-$queryId-$epochId"))
    } else if (overwrite) {
      // complete-mode contract: the table must equal THIS epoch's
      // result even when that result is empty — an empty epoch
      // overwrites to empty rather than keeping the prior epoch's rows
      t.insertOverwriteTable(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    }
    deleteEpoch(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    deleteEpoch(epochId)

  private def deleteEpoch(epochId: Long): Unit = {
    store.deletePrefix(s"$stagePrefix/epoch=$epochId/")
    // drop the per-query prefix once its last epoch is gone, so finished
    // queries leave no empty directory chain on dir-backed stores (a
    // real object store has nothing left to remove)
    if (store.list(stagePrefix + "/").isEmpty)
      scala.util.Try(store.deletePrefix(stagePrefix + "/"))
    ()
  }
}

/** Executor-side factory: one spool object per (epoch, partition, task
  * attempt) — attempt-unique names make retries collision-free. */
private[graft] class GraftStageWriterFactory(tableRoot: String,
    stagePrefix: String, schema: StructType) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStageWriter(tableRoot,
      s"$stagePrefix/epoch=$epochId/w-$partitionId-$taskId.bin", schema)
}

/** `path` is the spool object's KEY relative to the table root (null =
  * this writer staged nothing). */
private[graft] case class StagedFileMessage(path: String) extends WriterCommitMessage

/** Spools rows to one framed-binary object; nothing is created for an
  * empty partition. Dir-backed store: the spool streams straight to the
  * object's file path (the file IS the object — zero extra copies).
  * Mounted store: the spool streams to executor-local scratch and lands
  * in the store as ONE PUT at task commit, so a zombie task that never
  * commits leaves at most a local temp file, not a store object. */
private[graft] class GraftStageWriter(tableRoot: String, stageKey: String,
    schema: StructType) extends DataWriter[InternalRow] {
  private lazy val dirStore: Option[graft.model.DirObjectStore] =
    graft.model.GraftStores.forRoot(tableRoot) match {
      case d: graft.model.DirObjectStore => Some(d)
      case _ => None
    }
  private var spool: Path = _
  private var out: DataOutputStream = _

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      spool = dirStore match {
        case Some(d) =>
          val p = d.root.resolve(stageKey)
          Files.createDirectories(p.getParent)
          p
        case None => Files.createTempFile("graft-stream-spool-", ".bin")
      }
      out = new DataOutputStream(new BufferedOutputStream(
        Files.newOutputStream(spool)))
    }
    RowCodec.write(out, row, schema)
  }

  override def commit(): WriterCommitMessage = {
    close()
    if (spool == null) StagedFileMessage(null)
    else if (dirStore.isDefined) StagedFileMessage(stageKey) // already in place
    else
      try {
        graft.model.GraftStores.forRoot(tableRoot).putFile(stageKey, spool)
        StagedFileMessage(stageKey)
      } finally { Files.deleteIfExists(spool); () }
  }

  override def abort(): Unit = {
    close()
    if (spool != null) { Files.deleteIfExists(spool); () }
  }

  override def close(): Unit = {
    if (out != null) { out.close(); out = null }
  }
}

/** Framed binary row codec over a declared schema — the staging wire
  * format between the V2 streaming writers (which see catalyst
  * `InternalRow`s) and the driver-side epoch commit (which rebuilds
  * external `Row`s for `createDataFrame`). Encoding is schema-driven
  * field-by-field: a null byte, then the value. Temporal values move as
  * their catalyst epoch numbers and rebuild as `java.time` types
  * (`Instant`/`LocalDate`/`LocalDateTime`), which round-trip timezone-
  * free; decimals move as unscaled bytes + scale. STRUCT/MAP/ARRAY nest
  * arbitrarily (round-13): the schema-driven walk recurses — a struct is
  * its fields' flags+values in order, a map is its size then key/value
  * pairs (keys are non-null by Spark's contract), an array is its size
  * then flagged elements — so a `from_json`-shaped stream writes
  * straight to the table without a flatten detour. Unsupported LEAF
  * types are still rejected up front, before the query starts. */
private[graft] object RowCodec extends Serializable {

  def validate(schema: StructType): Unit =
    schema.fields.foreach(f => validateType(f.dataType, f.name))

  private def validateType(dt: DataType, where: String): Unit = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType |
         DateType | TimestampType | TimestampNTZType => ()
    case _: DecimalType => ()
    case ArrayType(et, _) => validateType(et, s"$where[]")
    case st: StructType =>
      st.fields.foreach(f => validateType(f.dataType, s"$where.${f.name}"))
    case MapType(kt, vt, _) =>
      validateType(kt, s"$where<key>")
      validateType(vt, s"$where<value>")
    case other => throw new IllegalArgumentException(
      s"streaming write does not support $other (column $where)")
  }

  def write(out: DataOutputStream, row: InternalRow, schema: StructType): Unit = {
    var i = 0
    while (i < schema.length) {
      val isNull = row.isNullAt(i)
      out.writeBoolean(isNull)
      if (!isNull) writeValue(out, row, i, schema(i).dataType)
      i += 1
    }
  }

  /** One recursive writer over [[SpecializedGetters]] — `InternalRow`,
    * `ArrayData` and a map's key/value arrays all expose it, so struct
    * fields, array elements and map entries share this code path. */
  private def writeValue(out: DataOutputStream, g: SpecializedGetters, i: Int,
      dt: DataType): Unit = dt match {
    case BooleanType => out.writeBoolean(g.getBoolean(i))
    case ByteType => out.writeByte(g.getByte(i).toInt)
    case ShortType => out.writeShort(g.getShort(i).toInt)
    case IntegerType | DateType => out.writeInt(g.getInt(i))
    case LongType | TimestampType | TimestampNTZType => out.writeLong(g.getLong(i))
    case FloatType => out.writeFloat(g.getFloat(i))
    case DoubleType => out.writeDouble(g.getDouble(i))
    case StringType => writeBytes(out, g.getUTF8String(i).getBytes)
    case BinaryType => writeBytes(out, g.getBinary(i))
    case d: DecimalType =>
      val bd = g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
      writeBytes(out, bd.unscaledValue().toByteArray)
      out.writeInt(bd.scale())
    case ArrayType(et, _) =>
      val arr = g.getArray(i)
      out.writeInt(arr.numElements())
      var j = 0
      while (j < arr.numElements()) {
        val n = arr.isNullAt(j)
        out.writeBoolean(n)
        if (!n) writeValue(out, arr, j, et)
        j += 1
      }
    case st: StructType =>
      val r = g.getStruct(i, st.length)
      var j = 0
      while (j < st.length) {
        val n = r.isNullAt(j)
        out.writeBoolean(n)
        if (!n) writeValue(out, r, j, st(j).dataType)
        j += 1
      }
    case MapType(kt, vt, _) =>
      val m = g.getMap(i)
      val keys = m.keyArray()
      val vals = m.valueArray()
      out.writeInt(m.numElements())
      var j = 0
      while (j < m.numElements()) {
        writeValue(out, keys, j, kt) // map keys are non-null by contract
        val n = vals.isNullAt(j)
        out.writeBoolean(n)
        if (!n) writeValue(out, vals, j, vt)
        j += 1
      }
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length)
    out.write(b)
  }

  /** Read every row of a staged file back as external Rows. */
  def readAll(path: Path, schema: StructType): Iterator[Row] =
    readAll(Files.newInputStream(path), schema)

  /** Stream variant — the spool may arrive from any [[graft.model
    * .ObjectStore]] (`openStream`), not just a filesystem path. */
  def readAll(raw: java.io.InputStream, schema: StructType): Iterator[Row] = {
    val in = new DataInputStream(new BufferedInputStream(raw))
    // A consumer that stops early (downstream limit, task kill) never
    // drains to EOF, so EOF-triggered close alone leaks the handle;
    // tie the stream to the task lifetime when one exists.
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => in.close()))
    new Iterator[Row] {
      private var nextRow: Row = advance()
      private def advance(): Row = {
        val first =
          try in.read()
          catch {
            case _: java.io.EOFException => -1
            case e: Throwable => in.close(); throw e
          }
        if (first < 0) { in.close(); null }
        else {
          val vals = new Array[Any](schema.length)
          var i = 0
          while (i < schema.length) {
            val isNull = if (i == 0) first != 0 else in.readBoolean()
            vals(i) = if (isNull) null else readValue(in, schema(i).dataType)
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = {
        val r = nextRow
        nextRow = advance()
        r
      }
    }
  }

  private def readValue(in: DataInputStream, dt: DataType): Any = dt match {
    case BooleanType => in.readBoolean()
    case ByteType => in.readByte()
    case ShortType => in.readShort()
    case IntegerType => in.readInt()
    case DateType => java.time.LocalDate.ofEpochDay(in.readInt().toLong)
    case LongType => in.readLong()
    case TimestampType =>
      val us = in.readLong()
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    case TimestampNTZType =>
      val us = in.readLong()
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case FloatType => in.readFloat()
    case DoubleType => in.readDouble()
    case StringType => new String(readBytes(in), java.nio.charset.StandardCharsets.UTF_8)
    case BinaryType => readBytes(in)
    case _: DecimalType =>
      val unscaled = readBytes(in)
      val scale = in.readInt()
      new java.math.BigDecimal(new java.math.BigInteger(unscaled), scale)
    case ArrayType(et, _) =>
      val n = in.readInt()
      val b = Seq.newBuilder[Any]
      var j = 0
      while (j < n) {
        b += (if (in.readBoolean()) null else readValue(in, et))
        j += 1
      }
      b.result()
    case st: StructType =>
      val vals = new Array[Any](st.length)
      var j = 0
      while (j < st.length) {
        vals(j) = if (in.readBoolean()) null else readValue(in, st(j).dataType)
        j += 1
      }
      Row.fromSeq(vals.toIndexedSeq)
    case MapType(kt, vt, _) =>
      val n = in.readInt()
      val b = Map.newBuilder[Any, Any]
      var j = 0
      while (j < n) {
        val k = readValue(in, kt)
        b += (k -> (if (in.readBoolean()) null else readValue(in, vt)))
        j += 1
      }
      b.result()
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }
}
