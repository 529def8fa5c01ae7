package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistinctiveTermsSpec extends SparkSpec {

  import spark.implicits._

  private val docs = (
    (1 to 10).map(i => ("A", "apple apple apple banana")) ++
    (1 to 10).map(i => ("B", "cherry cherry cherry banana")) ++
    Seq(("A", "zyzzyva"))
  ).toDF("source", "text")

  test("frequent-and-skewed beats both stopwords and one-offs") {
    val out = DistinctiveTerms.distinctiveTerms(docs, "source", "text",
      k = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getLong(4))).toMap
    // apple is A's top term; cherry is B's
    assert(out(("A", "apple"))._2 === 1L, out.toString)
    assert(out(("B", "cherry"))._2 === 1L)
    // the 100%-skewed ONE-OFF ranks below the frequent skewed term:
    // the informative prior shrinks it toward the corpus rate
    assert(out(("A", "zyzzyva"))._1 < out(("A", "apple"))._1)
    // balanced term scores near zero on both sides, far below the tops
    assert(math.abs(out(("A", "banana"))._1) < 0.5)
    assert(out(("A", "banana"))._1 < out(("A", "apple"))._1)
  }

  test("z is antisymmetric for a two-group corpus") {
    val out = DistinctiveTerms.distinctiveTerms(docs, "source", "text",
      k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // apple in A vs apple-in-B's complement view: group A's z for
    // apple equals minus group B's z for apple (B has y_g = 0 for
    // apple so it is absent there — check banana instead, present in
    // both: z_A(banana) = -z_B(banana))
    assert(out(("A", "banana")) === -out(("B", "banana")))
  }

  test("k bounds the per-group output; ranks are 1..k dense") {
    val out = DistinctiveTerms.distinctiveTerms(docs, "source", "text",
      k = 2)
    val byG = out.collect().groupBy(_.getString(0))
    byG.values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_.getLong(4)).sorted.toSeq ===
        (1L to rows.length).toSeq)
    }
  }
}
