package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial hashes of every character k-gram of a string — the
  * winnowing (MOSS) gram stage — in ONE rolling pass.
  *
  * Replaces the composition in [[graft.text.Winnowing.gramHashes]]
  * (`transform(sequence(...), i -> aggregate(sequence(i, i+k-1), ...))`)
  * which recomputes a k-term Horner fold per position and allocates a
  * k-element sequence array per gram — O(len·k) work and O(len)
  * allocations per document. The rolling form drops the leading code
  * point with a precomputed 31^(k-1) mod p term and appends the new
  * one: O(len) total, zero allocation beyond the output array.
  * Bit-identical values (pure BIGINT arithmetic mod 1e9+7, same as the
  * DuckDB oracle's list_reduce) asserted in GramHashesSpec.
  *
  * Semantics: null → null; fewer than k code points → empty array;
  * else hash(i) = Horner_{31 mod p}(codePoints[i .. i+k-1]).
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires (string, k >= 1), got " +
        s"${child.dataType.simpleString}, k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GramHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  val Mod = 1000000007L
  val Base = 31L

  /** Static entry point shared by eval and codegen. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    // code points, decoded once (surrogate pairs = one point, matching
    // the split-by-"" + ascii() composition)
    val n = str.codePointCount(0, str.length)
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Long](n)
    var i = 0
    var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(i) = cp.toLong
      i += 1
      ci += Character.charCount(cp)
    }
    // 31^(k-1) mod p for the rolling removal of the leading code point
    var pow = 1L
    var j = 1
    while (j < k) { pow = (pow * Base) % Mod; j += 1 }
    val out = new Array[Long](n - k + 1)
    var acc = 0L
    var idx = 0
    while (idx < n) {
      acc = (acc * Base + cps(idx)) % Mod
      if (idx >= k) {
        // already folded k+1 terms: remove the leading one
        acc = (acc - (cps(idx - k) * ((pow * Base) % Mod)) % Mod + Mod) % Mod
      }
      if (idx >= k - 1) out(idx - k + 1) = acc
      idx += 1
    }
    new GenericArrayData(out)
  }
}
