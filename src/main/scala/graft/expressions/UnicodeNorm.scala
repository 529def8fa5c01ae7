package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UNICODE CANONICALIZATION — the dedup-key prerequisite Spark has no
  * built-in for: the same visible text arrives precomposed (é =
  * U+00E9) from one crawler and decomposed (e + U+0301) from another,
  * so byte-exact dedup, hash blocking, and token counting all silently
  * treat equal strings as distinct. `stripAccents = false` applies
  * Unicode NFC (canonical composition — the normalization DuckDB's
  * `nfc_normalize` implements, so fixtures sit under the exact
  * oracle); `stripAccents = true` additionally folds diacritics (NFD →
  * drop combining marks → NFC, the `strip_accents` twin: é → e, ß and
  * Ł untouched — no decomposition exists).
  *
  * Why a custom Expression and not a UDF: one static call under
  * whole-stage codegen, no Row boxing, registered SQL-side as
  * `graft_unicode_norm(s, strip)` like the rest of the family. NFC
  * results are stable across Unicode versions for assigned code
  * points, so JVM `java.text.Normalizer` and DuckDB's utf8proc agree
  * bit-for-bit (UnicodeNormSpec + the c5_unicode_normalize oracle
  * execute that claim). */
case class UnicodeNorm(child: Expression, stripAccents: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_norm requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.compute(input.asInstanceOf[UTF8String], stripAccents)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNorm.compute($c, $stripAccents)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {

  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Static entry point shared by eval and codegen. */
  def compute(s: UTF8String, stripAccents: Boolean): UTF8String = {
    val str = s.toString
    val out =
      if (!stripAccents)
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      else {
        val nfd =
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
        java.text.Normalizer.normalize(
          CombiningMarks.matcher(nfd).replaceAll(""),
          java.text.Normalizer.Form.NFC)
      }
    UTF8String.fromString(out)
  }
}
