package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA OVER THE EMBEDDING COLUMN — the missing linear-algebra staple
  * of the similarity family: whitening / dimensionality reduction
  * before ANN (lower-d codes probe better), drift reads on embedding
  * spaces (top-component rotation between snapshots), and the "is
  * this embedding column degenerate" health check (one dominant
  * eigenvalue = collapsed encoder).
  *
  * Three pieces, split along the repo's audit-vs-scale convention:
  *
  *  - [[covarianceExact]] — the ORACLE shape: every element quantized
  *    to the 6-dp grid with the floor-portable round, pairwise
  *    products folded as exact decimals, covariance one fixed double
  *    sequence from exact sums. Bit-exact under DuckDB. Cost is
  *    O(n·d²) rows through one shuffle — the audit form, priced like
  *    exact KNN: run it on samples/audits, not the corpus.
  *  - [[fit]] — the SCALE path: one `treeAggregate` pass accumulating
  *    (n, Σx, Σxxᵀ) in primitive arrays (d + d(d+1)/2 doubles per
  *    partition — kilobytes at embedding dims), then a driver-side
  *    cyclic Jacobi eigensolve of the d×d covariance. The cluster
  *    never sees more than one partial per partition; the eigensolve
  *    is microseconds at d = 64. Float sums are combine-order
  *    dependent → rows+spec row, pinned against the exact form in
  *    PcaSpec.
  *  - [[project]] — scoring via the native [[graft.expressions
  *    .ProjectAffine]] expression (k·d primitive flops per row; the
  *    Column/HOF forms hit the measured Catalyst lambda hazards).
  *
  * Sign convention: each component's largest-|entry| coordinate is
  * made positive (eigenvector sign is arbitrary; an unpinned sign
  * flips between runs and breaks downstream diffs). */
object Pca {

  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                      components: Array[Array[Double]],
                      totalVariance: Double) {
    def varianceExplained: Array[Double] =
      eigenvalues.map(_ / totalVariance)
  }

  /** Upper-triangle sample covariance on the 6-dp quantized grid —
    * one row per (i ≤ j): `(i, j, n, cov (6dp))`. The floor-portable
    * quantization (×1e6, +0.5, floor, ÷1e6) makes every product an
    * exact DECIMAL both engines fold identically, and the SAME
    * floor-portable round finishes `cov` (NOT `round(·, 6)`: a tiny
    * negative raw covariance rounds to `-0.0` in DuckDB but `+0.0`
    * through Java BigDecimal — §5.3's signed-zero rule; `floor` of a
    * value in [0, 1) is `+0.0` in both engines, so the class is
    * structurally dead here). `idCol`, when given, is the natural
    * per-row key used for the self-join (§5.3: prefer a natural key
    * over `monotonically_increasing_id` in oracle-able queries);
    * callers without one fall back to the synthetic id, which is safe
    * here because the id only pairs a row with itself. */
  def covarianceExact(df: DataFrame, vecCol: String,
                      idCol: Option[String] = None): DataFrame = {
    val q = (floor(col("__x").cast("double") * lit(1e6) + lit(0.5))
      / lit(1e6)).cast("decimal(18,6)")
    val rid = idCol.map(col).getOrElse(monotonically_increasing_id())
    val elems = df
      .filter(col(vecCol).isNotNull)
      .select(rid.as("__rid"), col(vecCol))
      .select(col("__rid"), posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col("__rid"), col("__i").cast("bigint").as("__i"), q.as("__q"))
    val rhs = elems.select(col("__rid"), col("__i").as("__j"),
      col("__q").as("__q2"))
    val pairs = elems.join(rhs, "__rid")
      .filter(col("__j") >= col("__i"))
      .groupBy(col("__i").as("i"), col("__j").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("__q") * col("__q2")).as("__sxy"))
    val dims = elems.groupBy(col("__i")).agg(sum(col("__q")).as("__sx"))
    def d(c: Column) = c.cast("double")
    pairs
      .join(broadcast(dims.select(col("__i").as("i"),
        col("__sx").as("__si"))), "i")
      .join(broadcast(dims.select(col("__i").as("j"),
        col("__sx").as("__sj"))), "j")
      .select(col("i"), col("j"), col("n"),
        (floor(((d(col("__sxy")) - d(col("__si")) * d(col("__sj"))
          / d(col("n"))) / (d(col("n")) - lit(1.0))) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("cov"))
  }

  /** DuckDB twin of [[covarianceExact]]: `vecSql` must select `rid`
    * (a unique per-row key — the natural key when the table has one)
    * and `v` (the embedding list). */
  def sqlCovarianceExact(vecSql: String): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    s"""
    WITH rows0 AS (
      SELECT rid, v FROM ($vecSql)
      WHERE v IS NOT NULL
    ), elems AS (
      SELECT rid,
        CAST(unnest(generate_series(0, len(v) - 1)) AS BIGINT) AS i,
        CAST(floor(CAST(unnest(v) AS DOUBLE) * 1000000.0e0 + 0.5e0)
          / 1000000.0e0 AS DECIMAL(19,6)) AS q
      FROM rows0
    ), pairs AS (
      SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
        sum(a.q * b.q) AS sxy
      FROM elems a JOIN elems b ON a.rid = b.rid AND b.i >= a.i
      GROUP BY a.i, b.i
    ), dims AS (
      SELECT i, sum(q) AS sx FROM elems GROUP BY i)
    SELECT p.i, p.j, p.n,
      floor(((${d("p.sxy")} - ${d("di.sx")} * ${d("dj.sx")} / ${d("p.n")})
        / (${d("p.n")} - 1.0e0)) * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS cov
    FROM pairs p
    JOIN dims di ON di.i = p.i
    JOIN dims dj ON dj.i = p.j"""
  }

  /** One-pass treeAggregate fit: returns the top-`k` model. `df` rows
    * with null vectors are skipped; all vectors must share one
    * dimension (the first row pins it). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val vecs = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .rdd.map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val dim = vecs.first().length
    val tri = dim * (dim + 1) / 2
    // acc = (n, Σx[dim], Σ upper-tri xxᵀ[tri])
    val zero = (0L, new Array[Double](dim), new Array[Double](tri))
    def seqOp(acc: (Long, Array[Double], Array[Double]),
              x: Array[Double]) = {
      require(x.length == dim, s"dim ${x.length} != $dim")
      var i = 0
      var t = 0
      while (i < dim) {
        acc._2(i) += x(i)
        var j = i
        while (j < dim) { acc._3(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      (acc._1 + 1L, acc._2, acc._3)
    }
    def combOp(a: (Long, Array[Double], Array[Double]),
               b: (Long, Array[Double], Array[Double])) = {
      var i = 0
      while (i < dim) { a._2(i) += b._2(i); i += 1 }
      var t = 0
      while (t < tri) { a._3(t) += b._3(t); t += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    val (n, s, ss) = vecs.treeAggregate(zero)(seqOp, combOp)
    require(n >= 2, s"need >= 2 vectors, got $n")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (ss(t) - s(i) * s(j) / n) / (n - 1.0)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    fromCovariance(mean, cov, k)
  }

  /** Eigensolve a covariance matrix into a model — exposed so the
    * exact-covariance audit path and the spec can share it. */
  def fromCovariance(mean: Array[Double], cov: Array[Array[Double]],
                     k: Int): PcaModel = {
    val dim = cov.length
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i))
    val kk = math.min(k, dim)
    val comps = order.take(kk).map { c =>
      val v = Array.tabulate(dim)(r => vecs(r)(c))
      // sign pin: largest-|entry| coordinate positive, first index on ties
      var bi = 0
      var b = 0.0
      var r = 0
      while (r < dim) {
        if (math.abs(v(r)) > b) { b = math.abs(v(r)); bi = r }
        r += 1
      }
      if (v(bi) < 0) v.map(-_) else v
    }.toArray
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    PcaModel(mean, order.take(kk).map(vals).toArray, comps, trace)
  }

  /** Cyclic Jacobi for symmetric matrices: returns (eigenvalues,
    * eigenvector COLUMNS). Deterministic sweep order; converges
    * quadratically — 30 sweeps is far beyond what d ≤ a few hundred
    * needs. */
  def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 30 && off > 1e-12) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tTan = tSign / (math.abs(theta) +
              math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var r = 0
            while (r < n) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            var cIdx = 0
            while (cIdx < n) {
              val apc = a(p)(cIdx); val aqc = a(q)(cIdx)
              a(p)(cIdx) = c * apc - s * aqc
              a(q)(cIdx) = s * apc + c * aqc
              val vp = v(cIdx)(p); val vq = v(cIdx)(q)
              v(cIdx)(p) = c * vp - s * vq
              v(cIdx)(q) = s * vp + c * vq
              cIdx += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Projection column: array<double> of the model's k scores for
    * `vec` — the native-expression scoring path. */
  def projectCol(vec: Column, model: PcaModel): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.ProjectAffine(
        org.apache.spark.sql.GraftColumnBridge.expression(vec),
        model.mean.toSeq, model.components.map(_.toSeq).toSeq))

  /** Project a frame: keeps `keepCols`, appends `pc` (array<double>). */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
              keepCols: Seq[String]): DataFrame =
    df.select(keepCols.map(col) :+
      projectCol(col(vecCol), model).as("pc"): _*)
}
