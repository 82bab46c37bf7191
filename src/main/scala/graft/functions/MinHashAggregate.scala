package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE native aggregate: for each of `perms`
  * deterministic permutations, the minimum of `xxhash64(i, h)` over all
  * input hashes `h` in the group. Bit-identical to the composable form
  * `min(xxhash64(lit(i), col)) for i <- 0 until perms` (same seed-chain:
  * seed 42 → hashInt(i) → hashLong(h)) but with a single 64-long mutable
  * buffer instead of 64 separate aggregate states, and one buffer update
  * per row instead of 64 expression-tree evaluations.
  *
  * TypedImperativeAggregate = the Spark-native sketch-aggregate surface
  * (partial aggregation + merge, distributes like any builtin).
  */
case class MinHashSig(
    child: Expression,
    perms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a BIGINT hash column, got $other")
  }

  // xxhash64(lit(i), h) with Spark's default seed 42: 42 → hashInt(i) → hashLong(h)
  private val seeds: Array[Long] =
    Array.tabulate(perms)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(perms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < perms) {
        val p = XXH64.hashLong(h, seeds(i))
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashFunctions {
  val FnName = "minhash_sig"

  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        FnName,
        exprs => MinHashSig(exprs.head,
          exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
        "built-in")

  /** minhash_sig(hashCol, perms): array of per-permutation minima. */
  def minhashSig(hashCol: Column, perms: Int): Column =
    call_function(FnName, hashCol, org.apache.spark.sql.functions.lit(perms))
}
