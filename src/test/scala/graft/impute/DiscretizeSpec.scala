package graft.impute

import graft.SparkSpec

class DiscretizeSpec extends SparkSpec {

  import spark.implicits._

  private val uniform = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")

  private def bins(df: org.apache.spark.sql.DataFrame, nBins: Int) =
    Discretize.quantileBins(df, "v", Seq("g"), nBins)
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap

  test("equal-frequency on uniform data: four near-equal bins, monotone") {
    val out = bins(uniform, 4)
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set(0, 1, 2, 3))
    // type-7 quartiles of 1..100 → 25/25/25/25
    assert(sizes.values.toSeq.sorted === Seq(25, 25, 25, 25))
    // monotone in v
    val sorted = out.toSeq.sortBy(_._1)
    assert(sorted.map(_._2).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("a value exactly on a fence goes to the LOWER bin (strict >)") {
    // 1..5: median fence (p=0.5) is 3.0 → v=3 stays in the lower bin
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = bins(df, 2)
    assert(out(3.0) === 0 && out(4.0) === 1)
  }

  test("per-group fences are independent") {
    val df = ((1 to 10).map(i => ("lo", i.toDouble)) ++
      (1001 to 1010).map(i => ("hi", i.toDouble))).toDF("g", "v")
    val out = Discretize.quantileBins(df, "v", Seq("g"), 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getInt(2)).toMap
    // each group splits around ITS own median, not the global one
    assert(out(("lo", 10.0)) === 1 && out(("hi", 1001.0)) === 0)
  }

  test("null values get a null bin; fences ignore them") {
    val df = (Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(4.0)), ("g", None))).toDF("g", "v")
    val rows = Discretize.quantileBins(df, "v", Seq("g"), 2).collect()
    val nullRow = rows.find(_.isNullAt(1)).get
    assert(nullRow.isNullAt(2))
    // fences over 1..4 only: 2.5 median → 2 below, 2 above
    val binned = rows.filterNot(_.isNullAt(1)).map(r => r.getDouble(1) -> r.getInt(2))
    assert(binned.count(_._2 == 0) === 2 && binned.count(_._2 == 1) === 2)
  }

  test("schema: appends exactly one int bin column") {
    val out = Discretize.quantileBins(uniform, "v", Seq("g"), 3)
    assert(out.columns.toSeq === Seq("g", "v", "v_bin"))
    assert(out.schema("v_bin").dataType.typeName === "integer")
  }
}
