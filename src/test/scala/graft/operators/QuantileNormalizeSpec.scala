package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileNormalizeSpec extends SparkSpec {

  import spark.implicits._

  test("disjoint groups land on the shared pooled support (hand map)") {
    // A = {1..10}, B = {11..20}: pooled = {1..20}, F_pool(u) = u/20.
    // A's k (F_A = k/10) -> min u with u/20 >= k/10 = 2k;
    // B's v -> 2(v-10). Both groups then share support {2,4,...,20}.
    val df = ((1 to 10).map(v => ("A", v.toDouble)) ++
      (11 to 20).map(v => ("B", v.toDouble))).toDF("g", "v")
    val out = QuantileNormalize.normalize(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    (1 to 10).foreach(k =>
      assert(out(("A", k.toDouble)) === 2.0 * k, s"A $k"))
    (11 to 20).foreach(v =>
      assert(out(("B", v.toDouble)) === 2.0 * (v - 10), s"B $v"))
  }

  test("identical groups normalize to identity") {
    val df = (Seq("A", "B").flatMap(g => (1 to 10).map(v =>
      (g, v.toDouble)))).toDF("g", "v")
    val out = QuantileNormalize.normalize(df, "g", "v")
    assert(out.filter(col("v") =!= col("v_norm")).count() === 0)
  }

  test("monotone within group; nulls pass through with null v_norm") {
    val df = (Seq(("A", Some(5.0)), ("A", Some(1.0)), ("A", Some(9.0)),
      ("A", None)) ++ (1 to 20).map(v => ("B", Some(v / 2.0))))
      .toDF("g", "v")
    val rows = QuantileNormalize.normalize(df, "g", "v")
      .filter(col("g") === "A").collect()
    val mapped = rows.filter(!_.isNullAt(2))
      .map(r => r.getDouble(1) -> r.getDouble(2)).sortBy(_._1)
    assert(mapped.map(_._2).toSeq === mapped.map(_._2).sorted.toSeq,
      "normalization must preserve within-group order")
    assert(rows.count(_.isNullAt(1)) === 1)
    assert(rows.filter(_.isNullAt(1)).forall(_.isNullAt(2)))
  }
}
