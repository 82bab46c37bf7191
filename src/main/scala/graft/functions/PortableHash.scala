package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, substring}

/** THE engine-portable hash: the first 4 md5 nibbles as an int in
  * [0, 65536). One definition for every consumer whose DuckDB oracle (or
  * driver-side twin) must stay digit-identical — the BUCKET index layout
  * ([[graft.operators.GraftTable.bucketExprOf]]), classifier feature
  * hashing ([[graft.llm.Classifier.featureId]]); the sampling operators
  * use the same shape with a salt prefix ([[graft.llm.Sampling.hashBucket]]).
  * Widening or changing this hash desynchronizes oracles AND on-disk
  * bucket layouts — it is part of the storage format.
  */
object PortableHash {

  /** Row-side: codegen'd md5 + hex-prefix parse. */
  def hex4(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")

  /** Driver-side twin: the first two md5 bytes ARE the first four hex
    * nibbles; both forms are non-negative so callers' `%` agree. */
  def hex4Jvm(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
  }
}
