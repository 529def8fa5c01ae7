package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native affine projection y = W·(x − μ) over a LITERAL (k × d)
  * component matrix — the hot loop of PCA scoring (and any other
  * learned linear map applied per row).
  *
  * Why a custom Expression (the [[CentroidTopK]] precedent): the
  * Column form is either k separate `aggregate`/`zip_with` subtrees
  * (planning super-linear in k) or a higher-order-function matrix
  * fold (interpreted, per-element allocations, and CollapseProject
  * re-inlines the centered vector into every lambda use). This runs
  * one virtual call per row into a primitive k·d loop.
  *
  * Arithmetic contract: per component c, y_c = Σ_j W[c][j]·(x_j −
  * μ_j) accumulated LEFT-TO-RIGHT over j in IEEE double — the same
  * fixed sequence the driver-side reference in PcaSpec uses. Input
  * is `array<float>` or `array<double>`; floats widen exactly.
  * Null input, null element, or a dimension mismatch → null row (a
  * silent prefix projection would mis-place plausibly). */
case class ProjectAffine(child: Expression, mean: Seq[Double],
                         components: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  require(components.nonEmpty &&
    components.forall(_.length == mean.length))

  @transient private lazy val k = components.length
  @transient private lazy val dim = mean.length
  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val row = components(c)
      var j = 0
      while (j < dim) { a(c * dim + j) = row(j); j += 1 }
      c += 1
    }
    a
  }

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_project_affine requires array<float|double>, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val cx = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (x.isNullAt(j)) return null
      val v = if (elemIsFloat) x.getFloat(j).toDouble else x.getDouble(j)
      cx(j) = v - mu(j)
      j += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      val base = c * dim
      var j2 = 0
      while (j2 < dim) { s += flat(base + j2) * cx(j2); j2 += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ProjectAffine = copy(child = newChild)
}
