package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainReweightSpec extends SparkSpec {

  import spark.implicits._

  // losses on the micro grid: domain "hard" loses 2.0 nats, "mid" 1.0,
  // "easy" 0.2
  private def losses = Seq(("hard", 2000000L), ("mid", 1000000L),
    ("easy", 200000L)).toDF("g", "loss")

  private def weightsOf(rounds: Int, eta: Double = 1.0,
                        smooth: Double = 0.1): Map[String, Double] =
    DomainReweight.reweight(losses, "g", "loss", rounds, eta, smooth)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

  test("the DRO direction: higher-loss domains gain weight, ordering " +
    "follows the losses, weights stay a (near-)distribution") {
    val w = weightsOf(rounds = 5)
    assert(w("hard") > w("mid") && w("mid") > w("easy"),
      s"weights must order with losses: $w")
    assert(w("hard") > 1.0 / 3, "the hard domain must gain vs uniform")
    val total = w.values.sum
    assert(math.abs(total - 1.0) < 1e-3,
      s"weights must stay normalized (up to grid truncation): $total")
  }

  test("uniform smoothing keeps every domain sampled even under an " +
    "extreme loss gap") {
    val extreme = Seq(("hot", 10000000L), ("cold", 0L)).toDF("g", "loss")
    val w = DomainReweight.reweight(extreme, "g", "loss", rounds = 8,
      eta = 2.0, smooth = 0.2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w("cold") >= 0.2 / 2 * 0.99,
      s"smoothing floor must hold: $w")
    assert(w("hot") > w("cold"))
  }

  test("equal losses converge to (grid-truncated) uniform; " +
    "determinism across runs") {
    val eq = Seq(("a", 500000L), ("b", 500000L), ("c", 500000L))
      .toDF("g", "loss")
    val w = DomainReweight.reweight(eq, "g", "loss", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.values.toSet.size === 1, s"equal losses → equal weights: $w")
    val w2 = DomainReweight.reweight(eq, "g", "loss", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w === w2)
  }

  test("more rounds sharpen toward the hard domain (monotone in t)") {
    val w2 = weightsOf(rounds = 2)
    val w6 = weightsOf(rounds = 6)
    assert(w6("hard") >= w2("hard"),
      s"ascent must not retreat: ${w2("hard")} -> ${w6("hard")}")
  }

  test("guards: empty domains, bad eta/smooth/rounds") {
    intercept[IllegalArgumentException] {
      DomainReweight.reweight(
        Seq.empty[(String, Long)].toDF("g", "loss"), "g", "loss", 1)
    }
    intercept[IllegalArgumentException] {
      DomainReweight.reweight(losses, "g", "loss", 0)
    }
    intercept[IllegalArgumentException] {
      DomainReweight.reweight(losses, "g", "loss", 1, eta = 0.0)
    }
    intercept[IllegalArgumentException] {
      DomainReweight.reweight(losses, "g", "loss", 1, smooth = 1.0)
    }
  }
}
