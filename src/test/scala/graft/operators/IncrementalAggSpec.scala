package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  private val g = Seq("l_returnflag", "l_linestatus")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDecimal(3), r.getDouble(4), r.getDouble(5))).toMap

  test("merge of shards ≡ full recompute, bit-exact; associative 3-way") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val full = rows(IncrementalAgg.state(li, g, "l_quantity"))
    val parts = (0 to 2).map(i =>
      IncrementalAgg.state(li.filter(pmod(col("l_orderkey"), lit(3L)) === i),
        g, "l_quantity"))
    val mergedLeft = rows(IncrementalAgg.merge(
      IncrementalAgg.merge(parts(0), parts(1), g), parts(2), g))
    val mergedRight = rows(IncrementalAgg.merge(
      parts(0), IncrementalAgg.merge(parts(1), parts(2), g), g))
    assert(mergedLeft === full)
    assert(mergedRight === full)
  }

  test("one-sided groups survive; nulls counted per SQL") {
    val a = Seq(("x", Some(1.0)), ("x", Some(3.0)), ("y", Some(5.0)))
      .toDF("k", "v")
    val b = Seq(("x", Some(2.0)), ("z", Option.empty[Double]))
      .toDF("k", "v")
    val m = IncrementalAgg.merge(
      IncrementalAgg.state(a, Seq("k"), "v"),
      IncrementalAgg.state(b, Seq("k"), "v"), Seq("k"))
    val fin = IncrementalAgg.finish(m).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fin.keySet === Set("x", "y", "z"))
    val x = fin("x")
    assert(x.getLong(1) === 3L && x.getDouble(2) === 6.0)
    assert(x.getDouble(3) === 1.0 && x.getDouble(4) === 3.0)
    assert(x.getDouble(5) === 2.0) // avg
    // all-null group: n=0, stats null, avg null (never NaN)
    val z = fin("z")
    assert(z.getLong(1) === 0L && z.isNullAt(3) && z.isNullAt(5))
  }

  test("distinct sketches: merge of shards ≡ full recompute on the estimate") {
    val li = graft.Tables.lineitem(spark, sf0001)
    def est(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.distinctFinish(df).drop("nd_sketch").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val full = est(IncrementalAgg.distinctState(li, g, "l_partkey"))
    val parts = (0 to 2).map(i => IncrementalAgg.distinctState(
      li.filter(pmod(col("l_orderkey"), lit(3L)) === i), g, "l_partkey"))
    val merged = est(IncrementalAgg.distinctMerge(
      IncrementalAgg.distinctMerge(parts(0), parts(1), g), parts(2), g))
    assert(merged === full,
      "unioned shard sketches must estimate identically to a one-shot sketch")
    // and the estimate is honest: within 5% of the exact distinct
    val exact = li.groupBy(g.map(col): _*)
      .agg(countDistinct(col("l_partkey")).as("nd")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    full.foreach { case (k, e) =>
      val x = exact(k).toDouble
      assert(math.abs(e - x) / x <= 0.05, s"group $k: est $e vs exact $x")
    }
  }

  test("quantile state: merge of shards ≡ full recompute, and finish ≡ " +
    "Spark percentile bit-exact") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val ps = Seq(0.5, 0.9, 0.99)
    def fin(state: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.quantileFinish(state, g, ps).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
    val full = fin(IncrementalAgg.quantileState(li, g, "l_extendedprice"))
    val parts = (0 to 2).map(i => IncrementalAgg.quantileState(
      li.filter(pmod(col("l_orderkey"), lit(3L)) === i),
      g, "l_extendedprice"))
    val merged = fin(IncrementalAgg.quantileMerge(
      IncrementalAgg.quantileMerge(parts(0), parts(1), g), parts(2), g))
    assert(merged === full, "merged shard counters must finish identically")
    // finish ≡ Spark's own percentile over the same grid — same type-7
    // interpolation double sequence, so equality is to the bit
    val ref = li
      .select(g.map(col) :+
        col("l_extendedprice").cast("decimal(18,2)").cast("double")
          .as("v"): _*)
      .groupBy(g.map(col): _*)
      .agg(expr(s"percentile(v, array(${ps.mkString(", ")}))").as("qs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[Double](2))
      .toMap
    full.foreach { case (k, (_, q50, q90, q99)) =>
      assert(Seq(q50, q90, q99) === ref(k).toSeq, s"group $k")
    }
  }

  test("quantile finish: hand-checked interpolation on a tiny axis") {
    // values 1,2,3,4 once each: p50 → pos 1.5 → 2·0.5 + 3·0.5 = 2.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0))
      .toDF("k", "v")
    val r = IncrementalAgg.quantileFinish(
      IncrementalAgg.quantileState(df, Seq("k"), "v"),
      Seq("k"), Seq(0.0, 0.5, 1.0)).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 4L)
    assert(r(0).getDouble(2) === 1.0) // q0
    assert(r(0).getDouble(3) === 2.5) // q500
    assert(r(0).getDouble(4) === 4.0) // q1000
  }

  test("finished avg equals direct per-group average on real data") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val fin = IncrementalAgg.finish(IncrementalAgg.state(li, g, "l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    val direct = li.groupBy(g.map(col): _*)
      .agg((sum(col("l_extendedprice").cast("decimal(32,6)")).cast("double") /
        count(col("l_extendedprice"))).as("a"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(fin === direct)
  }

  test("retractable state maintained over the change feed ≡ full " +
    "recompute; groups retracted to zero drop") {
    import graft.sources.VersionedTable
    val dir = s"${System.getProperty("java.io.tmpdir")}/ia_feed_" +
      java.util.UUID.randomUUID().toString.take(8)
    VersionedTable.drop(spark, dir)
    def part(rows: Seq[(String, Long, Double)], name: String): String = {
      rows.toDF("grp", "id", "v").coalesce(1)
        .write.parquet(s"$dir/data/$name")
      val f = new java.io.File(s"$dir/data/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getName
      s"data/$name/$f"
    }
    val schemaJson = Seq(("a", 1L, 1.0)).toDF("grp", "id", "v").schema.json
    val pa = part(Seq(("a", 1L, 1.5), ("a", 2L, 2.5), ("b", 3L, 10.0)), "pa")
    val pb = part(Seq(("c", 4L, 7.0), ("c", 5L, 7.0)), "pb")
    VersionedTable.publishFiles(spark, dir, "v1", schemaJson, Seq(pa, pb))
    // v2: pa carried; pb REWRITTEN — group c fully deleted, group a
    // grows, new group d appears
    val pb2 = part(Seq(("a", 6L, 4.0), ("d", 7L, 100.0)), "pb2")
    VersionedTable.publishFiles(spark, dir, "v2", schemaJson, Seq(pa, pb2))
    val v1State = IncrementalAgg.retractableState(
      VersionedTable.readAsOf(spark, dir, 1L), Seq("grp"), "v")
    val maintained = IncrementalAgg.maintainOverVersions(spark, dir,
      1L, 2L, v1State, Seq("grp"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2))).toMap
    val recomputed = IncrementalAgg.retractableState(
      VersionedTable.readAsOf(spark, dir, 2L), Seq("grp"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2))).toMap
    assert(maintained === recomputed,
      s"maintained $maintained vs recomputed $recomputed")
    assert(!maintained.contains("c"), "fully-retracted group must drop")
    assert(maintained("a")._1 === 3L && maintained("d")._1 === 1L)
    // manifest-carried per-file row counts let the maintainer
    // SANITY-CHECK its retraction totals without touching data: the
    // rows it retracts/accumulates are exactly the removed/added
    // files' recorded counts
    val (added, removed) = VersionedTable.changedFiles(spark, dir, 1L, 2L)
    val c1 = VersionedTable.fileRowCountsOf(spark, dir, 1L)
    val c2 = VersionedTable.fileRowCountsOf(spark, dir, 2L)
    assert(removed.map(c1).sum === 2L, "retraction total = pb's rows")
    assert(added.map(c2).sum === 2L, "accumulation total = pb2's rows")
    assert(VersionedTable.rowCountOf(spark, dir, 2L) === 5L)
    VersionedTable.drop(spark, dir)
  }
}
