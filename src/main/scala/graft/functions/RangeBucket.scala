package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range-bucket assignment against a driver-known, sorted boundary array,
  * as a pure codegen'd `Column` expression — the whole-stage-friendly
  * replacement for a `udf(k => binarySearch(k, boundaries))` closure.
  *
  * Used by the record-level index (build / maintenance / probe routing,
  * `GraftTable`) and by the suffix-dedup distinct-value layout
  * (`llm.Dedup.suffixLcps`). Both need the SAME bucket for a key whether
  * computed driver-side (planner probes) or executor-side (shuffle
  * routing), so the Column form and the JVM twin are built from one
  * comparison rule: unsigned UTF-8 byte order, which is exactly what
  * Spark's native string `<=` (UTF8String binary compare) implements —
  * that equivalence is what lets the executor side stay codegen'd.
  *
  * The Column form is a balanced `when`-tree binary search: O(boundaries)
  * expression NODES but O(log boundaries) comparisons on the evaluation
  * path, and no broadcast — boundaries embed as literals (bounded: ≤ a
  * few hundred short strings by every caller's construction).
  */
object RangeBucket {

  /** Unsigned UTF-8 byte comparison — the collation of Spark's native
    * string comparisons and of every boundary array in the engine. NOT
    * `String.compareTo` (UTF-16 code units): the two orders disagree
    * beyond the BMP (surrogate pairs sort above U+E000 in UTF-16 but
    * their UTF-8 bytes 0xF0.. sort above everything 3-byte). */
  def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** [[cmpUtf8]] as an `Ordering`, for driver-side sorts of boundary
    * candidates (a `.sorted` under the default String ordering would
    * produce an array the executor-side `<=` disagrees with). */
  val Utf8Ordering: Ordering[String] = (a: String, b: String) => cmpUtf8(a, b)

  /** JVM twin of [[bucketCol]]: the first `i` with
    * `key <= boundaries(i)` under UTF-8 byte order, else
    * `boundaries.length` (the open last bucket). */
  def bucketOf(key: String, boundaries: Array[String]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (cmpUtf8(key, boundaries(m)) <= 0) hi = m else lo = m + 1
    }
    lo
  }

  /** Codegen'd bucket of `key` under `boundaries` (sorted ascending in
    * UTF-8 byte order): bit-identical to [[bucketOf]] on non-null keys;
    * null key → null bucket (callers decide whether null keys are data
    * errors — a silent default bucket would hide them). */
  def bucketCol(key: Column, boundaries: Seq[String]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val m = (lo + hi) >>> 1
        when(key <= lit(boundaries(m)), go(lo, m)).otherwise(go(m + 1, hi))
      }
    when(key.isNull, lit(null).cast("int")).otherwise(go(0, boundaries.length))
  }
}
