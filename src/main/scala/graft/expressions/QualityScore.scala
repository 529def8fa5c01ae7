package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass composite quality score — the eighth custom
  * expression, escalated on a MEASURED constant: the built-in
  * composition in `TextFunctions.qualityScore` runs FOUR independent
  * lambda/array passes over the token array (wordCount, aggregate for
  * total token chars, array_distinct for diversity, plus the
  * tokenization itself), and the round-10k probe recorded the c7
  * family paying a 5.4× interpreted-lambda constant dominated by
  * exactly this scan (BASELINE.md: "a native quality-score expression
  * would buy the whole c7 family a constant factor"). This expression
  * tokenizes once and folds all three signals in that single pass —
  * same escalation rationale as [[Shingles]]/[[CharNgrams]].
  *
  * Semantics are BIT-IDENTICAL to the composition it replaces
  * (asserted in QualityScoreSpec over the real corpus + edge cases):
  *
  *   toks      = non-empty runs after splitting lower(text) on \s+
  *   wc        = |toks| (as double)
  *   lenScore  = least(wc/50, 1) · (wc > 2000 ? 0.5 : 1)
  *   diversity = wc = 0 ? 0 : |distinct toks| / wc
  *   awl       = wc = 0 ? 0 : Σ numChars(tok) / wc
  *   wlScore   = 3 ≤ awl ≤ 10 ? 1 : 0.5
  *   score     = round(lenScore·0.4 + diversity·0.4 + wlScore·0.2, 6)
  *
  * with `round` reproducing Spark's double rounding exactly
  * (`BigDecimal.valueOf(x).setScale(6, HALF_UP)`, NaN/Inf passthrough
  * — the RoundBase eval sequence), token lengths counted in CODE
  * POINTS (Spark `length` = UTF8String.numChars), and the same
  * left-associated IEEE addition order. null text → null. */
case class QualityScore(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quality_score requires string, got " +
        child.dataType.simpleString)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    QualityScore.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.QualityScore.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): QualityScore = copy(child = newChild)
}

object QualityScore {
  // same token runs as Shingles.compute: complement of the ASCII \s
  // class Spark's split(text, "\\s+") uses
  private val TokenRun = Pattern.compile("\\S+")

  /** Static entry point shared by eval and codegen. */
  def compute(text: UTF8String): Double = {
    val s = text.toLowerCase.toString
    val m = TokenRun.matcher(s)
    var wcL = 0L
    var charsL = 0L
    val seen = new java.util.HashSet[String]()
    while (m.find()) {
      val tok = s.substring(m.start, m.end)
      wcL += 1
      // Spark length() counts code points (UTF8String.numChars), not
      // UTF-16 units — supplementary-plane text must not double-count
      charsL += tok.codePointCount(0, tok.length)
      seen.add(tok)
    }
    val wc = wcL.toDouble
    val lenScore = math.min(wc / 50.0, 1.0) *
      (if (wc > 2000.0) 0.5 else 1.0)
    val diversity = if (wcL == 0L) 0.0 else seen.size.toDouble / wc
    val awl = if (wcL == 0L) 0.0 else charsL.toDouble / wc
    val wlScore = if (awl >= 3.0 && awl <= 10.0) 1.0 else 0.5
    // left-associated exactly like the Column composition:
    // ((lenScore·0.4 + diversity·0.4) + wlScore·0.2)
    val raw = lenScore * 0.4 + diversity * 0.4 + wlScore * 0.2
    // Spark RoundBase double path: NaN/Inf passthrough, else
    // BigDecimal.valueOf (Scala BigDecimal(Double)) + HALF_UP
    if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
    else java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}
