package graft.ml

import breeze.linalg.{*, DenseMatrix, DenseVector}
import breeze.numerics.sigmoid

import scala.util.Random

/** Weights of a trained RBM: `w` is nVisible×nHidden, `vBias` length
  * nVisible, `hBias` length nHidden. Small by construction (encoded
  * width is cardinality-capped, see ImputeSpec), so the whole struct
  * broadcasts to every executor at any data scale. */
final case class RbmWeights(
    w: DenseMatrix[Double],
    vBias: DenseVector[Double],
    hBias: DenseVector[Double]) extends Serializable {
  def nVisible: Int = w.rows
  def nHidden: Int = w.cols
}

/** Pure-Breeze (no Spark) CD-1 Restricted Boltzmann Machine — the math
  * core of the reference's TensorFlow graph (upstream: rbm.py; see
  * SURVEY.md §3.2 — /root/reference was empty, semantics derive from the
  * public upstream repo): sigmoid units, contrastive divergence k=1,
  * minibatch SGD with optional AdaGrad, dropout on the hidden layer,
  * early stopping on held-out-cell reconstruction error. Deterministic
  * given the seed.
  *
  * Inputs are matrices with rows = samples, every cell in [0,1]; missing
  * cells arrive already noise-filled (Encoding A8) with `known` marking
  * originally-present cells.
  */
object RbmCore {

  final case class Config(
      nHidden: Int = 16,
      learnRate: Double = 0.1,
      batchSize: Int = 64,
      dropout: Double = 0.5,
      maxEpochs: Int = 30,
      adagrad: Boolean = true,
      holdoutFraction: Double = 0.1,
      patience: Int = 3,
      seed: Long = 42L)

  def init(nVisible: Int, cfg: Config): RbmWeights = {
    val rng = new Random(cfg.seed)
    RbmWeights(
      DenseMatrix.fill(nVisible, cfg.nHidden)(rng.nextGaussian() * 0.1),
      DenseVector.zeros[Double](nVisible),
      DenseVector.zeros[Double](cfg.nHidden))
  }

  /** Deterministic up-down pass on probabilities (no sampling) — the
    * reference's transform semantics: v' = σ(σ(vW+c)Wᵀ+b). */
  def reconstruct(wts: RbmWeights, v: DenseMatrix[Double]): DenseMatrix[Double] = {
    val hIn = v * wts.w
    val h = sigmoid(hIn(*, ::) + wts.hBias)
    val vIn = h * wts.w.t
    sigmoid(vIn(*, ::) + wts.vBias)
  }

  /** σ(xM + bias) with bias broadcast across rows. */
  private def affineSigmoid(x: DenseMatrix[Double], m: DenseMatrix[Double],
                            bias: DenseVector[Double]): DenseMatrix[Double] = {
    val z = x * m
    sigmoid(z(*, ::) + bias)
  }

  final case class FitResult(weights: RbmWeights, epochErrors: Seq[Double])

  /** Data-parallel training backend for the 100 TB path (SURVEY §7 M5):
    * the classic MLlib pattern — weights broadcast each epoch, one
    * synchronous pass computes per-partition CD-1 gradient sums that
    * `treeReduce` combines (depth 2, so the driver never receives more
    * than √P partial results), driver applies the AdaGrad update.
    * Nothing on the driver scales with row count: the only driver-side
    * data is the (nv×nh) gradient and a small uniformly-sampled
    * validation set (content-hash row holdout, excluded from training)
    * for early stopping. Stochastic draws are seeded per ROW from the
    * row's content hash, so training is invariant to partitioning, row
    * order, and AQE re-plans.
    */
  def fitDistributed(encoded: org.apache.spark.sql.DataFrame,
                     layout: graft.impute.ColumnLayout,
                     cfg: Config): FitResult = {
    import breeze.linalg.{DenseMatrix => BM, DenseVector => BV}
    import org.apache.spark.storage.StorageLevel
    val nv = layout.width
    val nh = cfg.nHidden
    val spark = encoded.sparkSession
    val all = encoded
      .select(graft.impute.Encoding.VCol, graft.impute.Encoding.KnownCol)
      .rdd.map { row =>
        val v = row.getSeq[Double](0).toArray
        val k = graft.impute.Encoding.expandKnown(
          layout, row.getSeq[Boolean](1).toIndexedSeq)
        (v, k)
      }.persist(StorageLevel.MEMORY_AND_DISK)
    // deterministic ~10% row holdout (content-hashed, so it survives
    // repartitioning): validation rows are EXCLUDED from training, so
    // early stopping measures generalization, not training error
    def isHoldout(v: Array[Double]): Boolean =
      (java.util.Arrays.hashCode(v) & 0x7fffffff) % 10 == 0
    val data = all.filter(r => !isHoldout(r._1))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nTrain = data.count()
    // uniform (not first-partition-biased) validation sample
    val valRows = all.filter(r => isHoldout(r._1))
      .takeSample(withReplacement = false, 2000, cfg.seed)
    all.unpersist(blocking = false)
    if (nTrain == 0) {
      data.unpersist(blocking = false)
      return FitResult(init(nv, cfg), Seq.empty)
    }
    val valX = BM.tabulate(valRows.length, nv)((i, j) => valRows(i)._1(j))
    // NaN = "no early-stopping signal" (empty holdout): training then
    // runs to maxEpochs instead of silently stopping after patience+1
    // epochs on a constant fake 0.0 error
    def valError(w: RbmWeights): Double = {
      if (valRows.isEmpty) return Double.NaN
      val recon = reconstruct(w, valX)
      var se = 0.0; var cnt = 0L
      var i = 0
      while (i < valRows.length) {
        val k = valRows(i)._2
        var j = 0
        while (j < nv) {
          if (k(j)) { val d = recon(i, j) - valX(i, j); se += d * d; cnt += 1 }
          j += 1
        }
        i += 1
      }
      if (cnt == 0) Double.NaN else se / cnt
    }

    var wts = init(nv, cfg)
    val cacheW = BM.zeros[Double](nv, nh)
    val cacheB = BV.zeros[Double](nv)
    val cacheC = BV.zeros[Double](nh)
    val eps = 1e-8
    var best = wts
    var bestErr = Double.MaxValue
    var bad = 0
    val errors = Seq.newBuilder[Double]
    var epoch = 0
    while (epoch < cfg.maxEpochs && bad < cfg.patience) {
      val bc = spark.sparkContext.broadcast(wts)
      val seedE = cfg.seed + 31L * epoch
      val dropout = cfg.dropout
      type Acc = (BM[Double], BV[Double], BV[Double], Long)
      // per-ROW RNG seeded from the row's content hash: decorrelated
      // across rows (the original per-row fixed seed reused one stream
      // for every row) AND invariant to partition layout / row order
      // (a per-partition sequential RNG would not be)
      val partials = data.mapPartitions { it =>
        val w = bc.value
        val accW = BM.zeros[Double](nv, nh)
        val accB = BV.zeros[Double](nv)
        val accC = BV.zeros[Double](nh)
        var cnt = 0L
        it.foreach { row =>
          val rng = new scala.util.Random(
            seedE ^ (java.util.Arrays.hashCode(row._1).toLong * 0x9E3779B9L))
          val v0 = BV(row._1)
          val h0p = breeze.numerics.sigmoid(w.w.t * v0 + w.hBias)
          val h0s = h0p.map(p => if (rng.nextDouble() < p) 1.0 else 0.0)
          if (dropout > 0) {
            var j = 0
            while (j < nh) { if (rng.nextDouble() < dropout) h0s(j) = 0.0; j += 1 }
          }
          val v1p = breeze.numerics.sigmoid(w.w * h0s + w.vBias)
          val h1p = breeze.numerics.sigmoid(w.w.t * v1p + w.hBias)
          accW :+= v0 * h0p.t - v1p * h1p.t
          accB :+= v0 - v1p
          accC :+= h0p - h1p
          cnt += 1
        }
        Iterator.single((accW, accB, accC, cnt))
      }
      val (gw, gb, gc, cnt) = partials.treeReduce({ (a: Acc, b: Acc) =>
        (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4)
      }, depth = 2)
      bc.destroy()
      if (cnt > 0) {
        val dW = gw /:/ cnt.toDouble
        val dB = gb /:/ cnt.toDouble
        val dC = gc /:/ cnt.toDouble
        if (cfg.adagrad) {
          cacheW :+= dW *:* dW; cacheB :+= dB *:* dB; cacheC :+= dC *:* dC
          wts = RbmWeights(
            wts.w + (dW *:* cfg.learnRate) /:/ breeze.numerics.sqrt(cacheW + eps),
            wts.vBias + (dB *:* cfg.learnRate) /:/ breeze.numerics.sqrt(cacheB + eps),
            wts.hBias + (dC *:* cfg.learnRate) /:/ breeze.numerics.sqrt(cacheC + eps))
        } else {
          wts = RbmWeights(wts.w + dW *:* cfg.learnRate,
            wts.vBias + dB *:* cfg.learnRate, wts.hBias + dC *:* cfg.learnRate)
        }
      }
      val err = valError(wts)
      errors += err
      if (err.isNaN) { /* no holdout → no early-stop signal */ }
      else if (err < bestErr - 1e-12) { bestErr = err; best = wts; bad = 0 }
      else bad += 1
      epoch += 1
    }
    data.unpersist(blocking = false)
    FitResult(if (bestErr < Double.MaxValue) best else wts, errors.result())
  }

  /** Trains on `x` (noise-filled, [0,1] cells). A deterministic fraction
    * of `known` cells is hidden from training (replaced with noise) and
    * used as the early-stopping validation set — the reference's A9/A17
    * holdout. Returns the best-validation weights. */
  def fit(x: DenseMatrix[Double], known: DenseMatrix[Boolean], cfg: Config): FitResult = {
    val rng = new Random(cfg.seed)
    val n = x.rows
    val nv = x.cols
    require(known.rows == n && known.cols == nv, "mask shape mismatch")
    if (n == 0) return FitResult(init(nv, cfg), Seq.empty)

    // A9: hide a fraction of known cells; train sees noise there.
    val holdout = DenseMatrix.fill[Boolean](n, nv)(false)
    val train = x.copy
    var i = 0
    while (i < n) {
      var j = 0
      while (j < nv) {
        if (known(i, j) && rng.nextDouble() < cfg.holdoutFraction) {
          holdout(i, j) = true
          train(i, j) = rng.nextDouble()
        }
        j += 1
      }
      i += 1
    }

    var wts = init(nv, cfg)
    val cacheW = DenseMatrix.zeros[Double](nv, cfg.nHidden)
    val cacheB = DenseVector.zeros[Double](nv)
    val cacheC = DenseVector.zeros[Double](cfg.nHidden)
    val eps = 1e-8

    def valError(w: RbmWeights): Double = {
      val recon = reconstruct(w, train)
      var se = 0.0; var cnt = 0L
      var i = 0
      while (i < n) {
        var j = 0
        while (j < nv) {
          if (holdout(i, j)) { val d = recon(i, j) - x(i, j); se += d * d; cnt += 1 }
          j += 1
        }
        i += 1
      }
      if (cnt == 0) Double.NaN else se / cnt
    }

    var best = wts
    var bestErr = Double.MaxValue
    var bad = 0
    val errors = Seq.newBuilder[Double]
    var epoch = 0
    while (epoch < cfg.maxEpochs && bad < cfg.patience) {
      val order = rng.shuffle((0 until n).toVector)
      order.grouped(cfg.batchSize).foreach { idx =>
        val v0 = DenseMatrix.tabulate(idx.size, nv)((r, c) => train(idx(r), c))
        val h0p = affineSigmoid(v0, wts.w, wts.hBias)
        // sample hidden states, then dropout
        val h0s = h0p.mapValues(p => if (rng.nextDouble() < p) 1.0 else 0.0)
        if (cfg.dropout > 0) {
          var j = 0
          while (j < cfg.nHidden) {
            if (rng.nextDouble() < cfg.dropout) h0s(::, j) := 0.0
            j += 1
          }
        }
        val v1p = affineSigmoid(h0s, wts.w.t, wts.vBias)
        val h1p = affineSigmoid(v1p, wts.w, wts.hBias)
        val b = idx.size.toDouble
        val dW = (v0.t * h0p - v1p.t * h1p) /:/ b
        val dB = breeze.linalg.sum(v0 - v1p, breeze.linalg.Axis._0).t /:/ b
        val dC = breeze.linalg.sum(h0p - h1p, breeze.linalg.Axis._0).t /:/ b
        if (cfg.adagrad) {
          cacheW :+= dW *:* dW; cacheB :+= dB *:* dB; cacheC :+= dC *:* dC
          wts = RbmWeights(
            wts.w + (dW *:* cfg.learnRate) /:/ breeze.numerics.sqrt(cacheW + eps),
            wts.vBias + (dB *:* cfg.learnRate) /:/ breeze.numerics.sqrt(cacheB + eps),
            wts.hBias + (dC *:* cfg.learnRate) /:/ breeze.numerics.sqrt(cacheC + eps))
        } else {
          wts = RbmWeights(
            wts.w + dW *:* cfg.learnRate,
            wts.vBias + dB *:* cfg.learnRate,
            wts.hBias + dC *:* cfg.learnRate)
        }
      }
      val err = valError(wts)
      errors += err
      if (err.isNaN) { /* no holdout → no early-stop signal */ }
      else if (err < bestErr - 1e-12) { bestErr = err; best = wts; bad = 0 }
      else bad += 1
      epoch += 1
    }
    FitResult(if (bestErr < Double.MaxValue) best else wts, errors.result())
  }
}
