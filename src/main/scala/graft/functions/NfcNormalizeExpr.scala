package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Longest common prefix of two strings in CHARACTERS — the inner loop
  * of the sorted-suffix dedup ([[graft.llm.Dedup]]), as a native fused
  * expression. Semantically identical to the composable
  * `size(filter(sequence(1, least(len a, len b)), k -> substr(a,1,k) =
  * substr(b,1,k)))` — but that form copies O(L²) characters per
  * comparison (every prefix materialized twice); this is ONE O(L)
  * byte walk. Byte-prefix equality is codepoint-aligned before
  * counting (UTF-8 is prefix-preserving and self-synchronizing, so the
  * character LCP is the char count of the longest codepoint-aligned
  * common byte prefix — a mid-codepoint cut backs off to the previous
  * boundary, which keeps e.g. "é" vs "è" at 0, not 1).
  */
case class StringLcp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"string_lcp expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "string_lcp"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String]
    val b = r.asInstanceOf[UTF8String]
    val la = a.numBytes(); val lb = b.numBytes()
    val m = math.min(la, lb)
    var n = 0
    while (n < m && a.getByte(n) == b.getByte(n)) n += 1
    var boundary = n
    // bytes agree on [0, n), so codepoint structure agrees there too: a
    // continuation byte AT n (in whichever string continues) means the
    // common prefix ends mid-codepoint — back off to the last boundary
    val mid = (n < la && (a.getByte(n) & 0xC0) == 0x80) ||
      (n < lb && (b.getByte(n) & 0xC0) == 0x80)
    if (mid) {
      while (boundary > 0 && (a.getByte(boundary - 1) & 0xC0) == 0x80)
        boundary -= 1
      if (boundary > 0) boundary -= 1 // the unfinished codepoint's lead
    }
    var chars = 0
    var i = 0
    while (i < boundary) {
      if ((a.getByte(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    chars
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val m = ctx.freshName("m")
      val bd = ctx.freshName("bd")
      val mid = ctx.freshName("mid")
      val chars = ctx.freshName("chars")
      val i = ctx.freshName("i")
      s"""
         |int $la = $a.numBytes(); int $lb = $b.numBytes();
         |int $m = java.lang.Math.min($la, $lb);
         |int $n = 0;
         |while ($n < $m && $a.getByte($n) == $b.getByte($n)) $n++;
         |int $bd = $n;
         |boolean $mid = ($n < $la && ($a.getByte($n) & 0xC0) == 0x80) ||
         |  ($n < $lb && ($b.getByte($n) & 0xC0) == 0x80);
         |if ($mid) {
         |  while ($bd > 0 && ($a.getByte($bd - 1) & 0xC0) == 0x80) $bd--;
         |  if ($bd > 0) $bd--;
         |}
         |int $chars = 0;
         |for (int $i = 0; $i < $bd; $i++) {
         |  if (($a.getByte($i) & 0xC0) != 0x80) $chars++;
         |}
         |${ev.value} = $chars;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object TextFunctions {
  val NfcName = "nfc_normalize"
  val LcpName = "string_lcp"

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

  /** Register [[StringLcp]] (once per session; idempotent). */
  def registerLcp(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        LcpName, { exprs =>
          require(exprs.length == 2,
            s"$LcpName expects exactly 2 arguments, got ${exprs.length}")
          StringLcp(exprs.head, exprs(1))
        }, "built-in")

  /** Column API for [[StringLcp]] (register the session first). */
  def lcp(a: Column, b: Column): Column = call_function(LcpName, a, b)
}
