package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-file record-key Bloom filter support (the Hudi bloom-index analog,
  * kept in the commit manifest): one xxhash64 of the key (Spark's own
  * XXH64, seed 42 — identical bits on executor and driver), then
  * `numHashes` probe positions by double hashing. The SAME static
  * methods serve the build side (the aggregate below) and the probe side
  * (upsert planning / point lookups), so the two can never drift.
  */
object KeyBloom {
  /** ~1 byte per key at the default: 8 bits/key × 5 probes ≈ 2% FPP. */
  val DefaultBitsPerKey = 8
  val DefaultHashes = 5
  /** Per-file bloom cap: 16 Mbit = 2 MB, reached only past ~2M rows/file. */
  val MaxBits: Long = 1L << 24

  def hash(key: UTF8String): Long =
    XXH64.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset, key.numBytes, 42L)
  def hash(key: String): Long = hash(UTF8String.fromString(key))

  /** Kirsch-Mitzenmacher double hashing; the step is forced odd so probe
    * positions cycle through the whole table. */
  private def position(h: Long, i: Int, numBits: Int): Int = {
    val step = (h >>> 33) | 1L
    java.lang.Math.floorMod(h + i * step, numBits.toLong).toInt
  }

  def add(bits: Array[Byte], numHashes: Int, h: Long): Unit = {
    val m = bits.length * 8
    var i = 0
    while (i < numHashes) {
      val pos = position(h, i, m)
      bits(pos >> 3) = (bits(pos >> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  /** No false negatives by construction; ~2% false positives at defaults. */
  def contains(bits: Array[Byte], numHashes: Int, h: Long): Boolean = {
    val m = bits.length * 8
    var i = 0
    while (i < numHashes) {
      val pos = position(h, i, m)
      if ((bits(pos >> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Bloom size in bits for an expected key count: bitsPerKey × keys,
    * rounded up to a byte, bounded to [64, MaxBits]. */
  def sizeBits(expectedKeys: Long, bitsPerKey: Int = DefaultBitsPerKey): Int = {
    val raw = math.max(64L, expectedKeys * bitsPerKey)
    (math.min(MaxBits, (raw + 7) / 8 * 8)).toInt
  }

  /** Manifest encoding: "numHashes:base64(bits)" — JSON-safe, self-described. */
  def encode(numHashes: Int, bits: Array[Byte]): String =
    s"$numHashes:${java.util.Base64.getEncoder.encodeToString(bits)}"

  def decode(s: String): (Int, Array[Byte]) = {
    val i = s.indexOf(':')
    require(i > 0, s"malformed key bloom encoding")
    (s.substring(0, i).toInt, java.util.Base64.getDecoder.decode(s.substring(i + 1)))
  }
}

/** Native partial-aggregating Bloom builder over a string key column:
  * map-side partials produce one `numBits`-bit buffer per task (only
  * bloom BYTES shuffle, never keys — at a 100 TB bulk insert the build
  * job moves O(files × bloomBytes), not O(rows × keyBytes)), merged by
  * bitwise OR. Same TypedImperativeAggregate surface as [[MinHashSig]].
  */
case class KeyBloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "key_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"key_bloom_agg expects a STRING key column, got $other")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      KeyBloom.add(buf, numHashes, KeyBloom.hash(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KeyBloomFunctions {
  val FnName = "key_bloom_agg"

  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        FnName,
        exprs => KeyBloomAgg(exprs.head,
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int]).toAggregateExpression(),
        "built-in")

  /** key_bloom_agg(keyCol, numBits, numHashes): the group's bloom bits. */
  def keyBloomAgg(keyCol: Column, numBits: Int, numHashes: Int): Column =
    call_function(FnName, keyCol,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))
}
