package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder — the m-subspace codebook argmin of
  * [[graft.similarity.ProductQuantize.encode]] as ONE expression.
  *
  * Why (the [[CentroidTopK]] rationale applied to PQ): the Column
  * form builds m × ksub per-centroid distance subtrees (~3k
  * expression nodes at m=8, ksub=16, sub=8), which blows past the
  * JVM's 64 KB generated-method limit — Spark logs a Janino failure
  * and falls back to INTERPRETED projection for the whole pass
  * (measured 2.7 s for 2,000 rows at sf0.1; this expression runs the
  * same pass in ~0.1 s: one virtual call per row into primitive
  * loops). The win compounds with corpus size — encode is the pass
  * that touches every vector at build time.
  *
  * Arithmetic contract (bit-identical to the unrolled Column form it
  * replaces): per subspace j and centroid c,
  * d = Σ_t (x[j·sub+t] − c_t)² accumulated LEFT-TO-RIGHT in IEEE
  * double over the caller's micro-unit integer grid (exact in
  * double); the argmin scans centroid ids ascending with strict <,
  * so the lowest id wins ties — the (d, i) struct-min order. Returns
  * `array<bigint>` of m codes; null for a null or null-element
  * input; a WRONG-DIMENSION vector THROWS — a dimension mismatch is
  * a data bug, and the Column form this replaces also failed loudly
  * there (ANSI element_at past the array end), so a malformed vector
  * must not silently vanish from the PQ table. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
    codebooks.head.head.nonEmpty)
  // m/ksub/sub and the flat layout all derive from codebooks.head; a
  // RAGGED codebook (books with differing centroid counts, or centroids
  // of differing dims) would read a truncated/shifted centroid and emit
  // wrong codes silently — reject at construction, not mid-eval
  require(codebooks.forall(_.length == codebooks.head.length),
    "ragged codebook: every subspace must have the same centroid count")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "ragged codebook: every centroid must have the same dimension")

  @transient private lazy val m = codebooks.length
  @transient private lazy val ksub = codebooks.head.length
  @transient private lazy val sub = codebooks.head.head.length
  @transient private lazy val dim = m * sub
  // flat(j)(c*sub + t): subspace j's centroid c, component t
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map { book =>
      val a = new Array[Double](ksub * sub)
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var t = 0
        while (t < sub) { a(c * sub + t) = cent(t); t += 1 }
        c += 1
      }
      a
    }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() != dim)
      throw new IllegalArgumentException(
        s"graft_pq_encode: input vector has ${q.numElements()} " +
          s"elements, codebooks expect $dim (m=$m × sub=$sub) - " +
          "a dimension mismatch is a data bug, refusing to mis-code")
    val qd = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (q.isNullAt(i)) return null
      qd(i) = q.getLong(i).toDouble
      i += 1
    }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val book = flat(j)
      val off = j * sub
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        var s = 0.0
        var t = 0
        val base = c * sub
        while (t < sub) {
          val e = qd(off + t) - book(base + t)
          s += e * e
          t += 1
        }
        if (best < 0 || s < bestD) { best = c; bestD = s }
        c += 1
      }
      out(j) = best.toLong
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
