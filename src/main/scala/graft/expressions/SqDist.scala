package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native `Σ (aᵢ−bᵢ)²` over two array<double> columns — the squared
  * Euclidean distance of the KNN-impute candidate-scoring loop
  * (millions of pairs per query). Same escalation rationale as
  * [[DotProduct]]: the `aggregate(zip_with(a,b,(x,y)=>(x−y)*(x−y)),
  * 0.0, +)` composition allocates an intermediate array and evaluates
  * two lambda closures per element per PAIR; this compiles to a bare
  * primitive loop in whole-stage codegen.
  *
  * Arithmetic contract: left-to-right accumulation starting at 0.0 —
  * bit-identical to the aggregate composition AND to the per-column
  * `reduce(_ + _)` of squared diffs in `KnnImpute.impute` (the leading
  * 0.0+x is the IEEE identity), so swapping it in changes no result.
  * Null semantics identical to DotProduct: null if either array is
  * null, lengths differ, or any element is null.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // returns null even for two non-null inputs (length mismatch, null
  // element) — see DotProduct.nullable for the codegen hazard
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val e = x.getDouble(i) - y.getDouble(i)
      acc += e * e
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val e = ctx.freshName("e")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $e = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $e * $e;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}
