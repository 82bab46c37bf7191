package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen'd expression
  * — the text-cleanup step `TextAnalysis.normalizeStats` declared out of
  * scope in round 11 ("a JVM UDF wouldn't replicate in the oracle"),
  * now IN scope on both counts: the JVM's `java.text.Normalizer`
  * (Unicode canonical composition, a stable algorithm since Unicode
  * 4.1) evaluates inside whole-stage codegen — a static call per row,
  * no UDF boundary, no serialization — and DuckDB's `nfc_normalize`
  * implements the same canonical composition, so the operator is
  * oracle-checkable end to end. Normalizing 100 TB stays a scan.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  val NfcName = "nfc_normalize"

  /** Register [[NfcNormalize]] in the session's function registry (once
    * per session; idempotent). */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        NfcName, { exprs =>
          require(exprs.length == 1,
            s"$NfcName expects exactly 1 argument, got ${exprs.length}")
          NfcNormalize(exprs.head)
        }, "built-in")

  /** Column API for [[NfcNormalize]] (register the session first). */
  def nfc(c: Column): Column = call_function(NfcName, c)
}
