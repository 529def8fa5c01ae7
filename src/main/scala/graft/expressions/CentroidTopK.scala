package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native top-`nProbe`-nearest-centroids over a literal centroid
  * matrix — the hot loop of IVF-style cell assignment/probing
  * (KMeansLloyd.transform/probeCells, KnnImpute.imputeAnn).
  *
  * Why a custom Expression: the Column composition (an
  * array<struct> of per-centroid distance subtrees, argmin'd or
  * array_sort'd) hits BOTH Catalyst lambda hazards at realistic cell
  * counts — analysis/codegen goes super-linear in k when each centroid
  * is its own subtree, and even the matrix form pays interpreted
  * higher-order-function eval with per-element allocations (measured
  * via ProfileKnnAnn at k=233 over 54k rows: ~6-9 s of planning per
  * action in subtree form, ~6 s per pass in HOF form; this expression
  * runs the same pass in well under a second — one virtual call per
  * row into a primitive loop, k·dim flops, zero allocation until the
  * nProbe-sized output).
  *
  * Arithmetic contract (bit-identical to the Column form it replaces):
  * per centroid d = Σ_j (q_j − c_j)² accumulated LEFT-TO-RIGHT in
  * IEEE double (q is the caller's micro-unit integer grid, exact in
  * double); selection orders by (d, centroid id) — the same total
  * order as a (d, i) struct sort. Returns `array<struct<d, i>>` of
  * the nProbe nearest, nearest first; null for a null or
  * wrong-dimension input (a dimension mismatch is a data bug — a
  * silent prefix distance would mis-assign plausibly).
  */
case class CentroidTopK(child: Expression, centroids: Seq[Seq[Double]],
                        nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty && nProbe >= 1)

  @transient private lazy val k = centroids.length
  @transient private lazy val dim = centroids.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      var j = 0
      while (j < dim) { a(i * dim + j) = c(j); j += 1 }
      i += 1
    }
    a
  }
  @transient private lazy val nP = math.min(nProbe, k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_centroid_topk requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", DoubleType, nullable = false),
      StructField("i", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() != dim) return null
    val qd = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (q.isNullAt(j)) return null
      qd(j) = q.getLong(j).toDouble
      j += 1
    }
    val d = new Array[Double](k)
    var i = 0
    while (i < k) {
      var s = 0.0
      var j2 = 0
      val base = i * dim
      while (j2 < dim) {
        val e = qd(j2) - flat(base + j2)
        s += e * e
        j2 += 1
      }
      d(i) = s
      i += 1
    }
    // nP selection passes by (d, id): strict < scanning ids ascending
    // makes the lowest id win ties — the struct-sort order
    val used = new Array[Boolean](k)
    val out = new Array[Any](nP)
    var p = 0
    while (p < nP) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        if (!used(c) && (best < 0 || d(c) < bestD)) { best = c; bestD = d(c) }
        c += 1
      }
      used(best) = true
      out(p) = new GenericInternalRow(Array[Any](bestD, best.toLong))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}
