package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable polynomial string hash: Horner fold base 31 mod
  * 1e9+7 over the string's code points — the arithmetic DuckDB
  * reproduces exactly via `list_reduce`/`ascii` (same family as
  * [[graft.text.Winnowing]]'s gram hash), unlike xxhash64/murmur which
  * only Spark implements.
  *
  * Why a custom Expression: the built-in composition
  * `aggregate(filter(split(s, ""), ...), 0L, (acc, c) -> (acc*31 + ascii(c)) % p)`
  * materializes a per-character STRING ARRAY per input (measured: the
  * portable MinHash stage spent 6.8s at sf0.1, dominated by these
  * allocations). This is one pass over the code points, zero
  * allocation, and a single static call under whole-stage codegen.
  * Bit-identical to the composition (HornerHashSpec).
  *
  * Semantics: null → null; empty string → 0; else
  * `fold(0, cp => (acc * 31 + cp) % 1_000_000_007)` over code points
  * (matches Spark `split(s,"")` + `ascii`, which are code-point-wise).
  */
case class HornerHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_horner_hash requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HornerHash.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HornerHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HornerHash =
    copy(child = newChild)
}

object HornerHash {
  val Mod = 1000000007L
  val Base = 31L

  /** Static entry point shared by eval and codegen. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
