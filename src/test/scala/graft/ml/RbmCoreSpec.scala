package graft.ml

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

/** Pure math invariants for the CD-1 core (no Spark needed). */
class RbmCoreSpec extends AnyFunSuite {

  // Toy data: two redundant column-pairs — col1 copies col0, col3 copies
  // col2 — so reconstruction from correlation is actually learnable.
  private def toyData(n: Int): (DenseMatrix[Double], DenseMatrix[Boolean]) = {
    val rng = new scala.util.Random(1)
    val x = DenseMatrix.zeros[Double](n, 4)
    for (i <- 0 until n) {
      val a = if (rng.nextBoolean()) 0.9 else 0.1
      val b = if (rng.nextBoolean()) 0.9 else 0.1
      x(i, 0) = a; x(i, 1) = a; x(i, 2) = b; x(i, 3) = b
    }
    (x, DenseMatrix.fill[Boolean](n, 4)(true))
  }

  test("reconstruct stays strictly inside (0,1)") {
    val (x, _) = toyData(50)
    val wts = RbmCore.init(4, RbmCore.Config(nHidden = 3))
    val r = RbmCore.reconstruct(wts, x)
    assert(r.toArray.forall(v => v > 0.0 && v < 1.0))
  }

  test("training reduces held-out reconstruction error on learnable data") {
    val (x, known) = toyData(400)
    val cfg = RbmCore.Config(nHidden = 8, learnRate = 0.3, batchSize = 32,
      dropout = 0.0, maxEpochs = 40, patience = 40, seed = 5)
    val res = RbmCore.fit(x, known, cfg)
    val errs = res.epochErrors
    assert(errs.nonEmpty)
    // late-phase error should beat the first epoch's
    assert(errs.takeRight(5).min < errs.head,
      s"no improvement: first=${errs.head} last5=${errs.takeRight(5)}")
    // and should beat chance (uniform guess MSE on 0.1/0.9 data ~ 0.16+)
    assert(errs.min < 0.12, s"best error ${errs.min}")
  }

  test("same seed, same data → identical weights (determinism)") {
    val (x, known) = toyData(100)
    val cfg = RbmCore.Config(nHidden = 4, maxEpochs = 5, seed = 9)
    val a = RbmCore.fit(x.copy, known.copy, cfg).weights
    val b = RbmCore.fit(x.copy, known.copy, cfg).weights
    assert(a.w === b.w && a.vBias === b.vBias && a.hBias === b.hBias)
  }
}
