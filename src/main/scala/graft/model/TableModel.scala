package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core data-model of the engine: a mutable keyed table materialized as
  * immutable parquet snapshots, fed by an append-only CDC stream.
  *
  * Semantics derived from the reference's configuration surface
  * (doitintl/aws-dms-to-hudi):
  *  - record key: one or more source PK columns
  *    (example-configs.json:36 `"c_w_id,c_d_id,c_id"`; handler.py:76)
  *  - ordering / precombine field: `trx_seq` string(50), injected from
  *    the CDC change sequence (templates/aws-dms-to-hudi.yaml:490-506,
  *    handler.py:77)
  *  - soft-delete flag: `_hoodie_is_deleted` boolean
  *    (templates/aws-dms-to-hudi.yaml:507-522)
  */
object Meta {
  /** Synthetic single-column encoding of the (possibly composite) record
    * key. Kept as a real column so file-level min/max statistics can prune
    * the upsert join (100 TB design: only files whose key range overlaps
    * the incoming batch are rewritten).
    */
  val RecordKey = "_graft_record_key"
  /** CDC ordering field (reference: trx_seq from $AR_H_CHANGE_SEQ). Kept as
    * string — DMS AR_H_CHANGE_SEQ is a fixed-width numeric string, so
    * lexicographic order == numeric order (aws-dms-to-hudi.yaml:502-505). */
  val Ordering = "trx_seq"
  /** Soft-delete tombstone (reference: _hoodie_is_deleted). */
  val Deleted = "_hoodie_is_deleted"
  /** Commit sequence the row version was written in — the deterministic
    * last tie-break for merges: on equal (trx_seq, tombstone) the LATER
    * commit wins, matching Hudi's incoming-wins-on-equal-ordering payload
    * semantics. Without it, a zone lacking trx_seq (constant injected
    * ordering) would resolve cross-batch updates arbitrarily. */
  val CommitSeq = "_graft_commit_seq"

  def isMeta(col: String): Boolean = col == RecordKey || col == CommitSeq
}

/** Key generators — reference handler.py:97-110: SimpleKeyGenerator (1 col),
  * ComplexKeyGenerator (N cols), NonpartitionedKeyGenerator.
  *
  * Spark-first: the key is an expression over the row, evaluated inside
  * codegen (concat_ws), never a driver-side loop.
  */
object KeyGen {
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

  /** Encode one key value as an order-friendly string. Integral types are
    * zero-padded to fixed width so lexicographic order == numeric order for
    * non-negative keys — this keeps range-partitioned file layouts tight
    * (a raw cast gives "999" > "1000" and scrambles clustering, inflating
    * the affected-file set per upsert batch). Negative integral keys sort
    * before all non-negative ones (sign char < '0') but are scrambled among
    * themselves — same trade-off Hudi's string keys make.
    */
  private def encoded(df: DataFrame, field: String): Column =
    df.schema(field).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        format_string("%019d", col(field))
      case _ => col(field).cast("string")
    }

  /** Escape separator chars in composite-key components so distinct key
    * tuples can never encode to the same string: values ("x,f2:y","z") and
    * ("x","y,f2:z") stay distinct because , : \ inside a value are
    * backslash-escaped before joining.
    */
  private def escaped(c: Column): Column =
    regexp_replace(c, "([\\\\,:])", "\\\\$1")

  /** Build the `_graft_record_key` column from the configured key fields.
    * Composite keys are encoded `f1:v1,f2:v2` (field-qualified, separator-
    * escaped). Evaluated inside codegen — never a driver-side loop.
    */
  def keyColumn(df: DataFrame, keyFields: Seq[String]): Column = {
    require(keyFields.nonEmpty, "record key needs at least one field")
    if (keyFields.size == 1) encoded(df, keyFields.head)
    else concat_ws(",",
      keyFields.map(f => concat(lit(f + ":"), escaped(encoded(df, f)))): _*)
  }

  def withRecordKey(df: DataFrame, keyFields: Seq[String]): DataFrame =
    df.withColumn(Meta.RecordKey, keyColumn(df, keyFields))
}
