package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string in one pass — the language-profile
  * primitive (C5).
  *
  * Why a custom Expression: the composition
  * `transform(sequence(1, length(s) - (n-1)), i -> substring(s, i, n))`
  * calls `substring` per position, and UTF8String seeks to a character
  * offset by scanning from the string start — O(len²) per document
  * (2.5s for the 5k-doc corpus at sf0.1). This walks the code points
  * once and emits each window — O(len·n) — as a single static call
  * under whole-stage codegen. Same escalation pattern as [[Shingles]];
  * bit-identical output asserted in CharNgramsSpec.
  *
  * Semantics (match the composition): null → null; fewer than n code
  * points → empty array; else 1 gram per position, code-point windows
  * (`substring`/`length` are code-point based).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams requires (string, n >= 1), got " +
        s"${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  /** Static entry point shared by eval and codegen. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // char (UTF-16) offset of each code point, so window i is the
    // substring between offsets(i) and offsets(i + n)
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return new GenericArrayData(Array.empty[AnyRef])
    val offsets = new Array[Int](cpCount + 1)
    var ci = 0
    var i = 0
    while (ci < str.length) {
      offsets(i) = ci
      ci += Character.charCount(str.codePointAt(ci))
      i += 1
    }
    offsets(cpCount) = str.length
    val out = new Array[AnyRef](cpCount - n + 1)
    i = 0
    while (i <= cpCount - n) {
      out(i) = UTF8String.fromString(str.substring(offsets(i), offsets(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
