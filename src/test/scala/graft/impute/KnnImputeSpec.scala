package graft.impute

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.sql.functions._

/** KNN imputer invariants — the reference library's own test style
  * (§5.1): no NaNs remain, known cells untouched, imputed values live
  * inside the donor range; plus k=1 nearest-donor exactness on a hand
  * fixture. */
class KnnImputeSpec extends SparkSpec {

  import spark.implicits._

  test("k=1 copies the nearest donor; ties break by donor id") {
    val df = Seq(
      (1L, Some(10.0), 0.0),   // donor at x=0
      (2L, Some(20.0), 1.0),   // donor at x=1
      (3L, Some(30.0), 0.4),   // donor at x=0.4
      (4L, Option.empty[Double], 0.35), // nearest donor: id 3 (x=0.4)
      (5L, Option.empty[Double], 0.5))  // 0.4 vs 0.6 → donor 3 again
      .toDF("id", "v", "x")
    val out = KnnImpute.impute(df, "id", "v", Seq("x"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(4L) === 30.0 && out(5L) === 30.0)
    assert(out(1L) === 10.0 && out(2L) === 20.0) // known cells untouched
  }

  test("categorical: donor-majority vote; 2-2 ties go to the earliest donor") {
    // recipient at x=0; donors ranked by distance: 1:A, 2:B, 3:B, 4:A
    val df = Seq(
      (1L, Some("A"), 1.0), (2L, Some("B"), 2.0),
      (3L, Some("B"), 3.0), (4L, Some("A"), 4.0),
      (9L, Option.empty[String], 0.0))
      .toDF("id", "lab", "x")
    // k=3 → {A, B, B}: clear majority B
    val k3 = KnnImpute.imputeCategorical(df, "id", "lab", Seq("x"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k3(9L) === "B")
    assert(k3(1L) === "A" && k3(2L) === "B") // known cells untouched
    // k=4 → {A, B, B, A}: 2-2 tie; A owns rank 1 (earliest donor) → A
    val k4 = KnnImpute.imputeCategorical(df, "id", "lab", Seq("x"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k4(9L) === "A")
    // a null FEATURE row keeps its null label (no geometry, no vote)
    val withNullFeat = df.union(
      Seq((10L, Option.empty[String], Option.empty[Double]))
        .toDF("id", "lab", "x"))
    val out = KnnImpute.imputeCategorical(withNullFeat, "id", "lab",
        Seq("x"), k = 3)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(10L).isEmpty)
  }

  test("donor-index merge: new donors serve immediately under frozen geometry") {
    val tmp = java.nio.file.Files.createTempDirectory("knn_don").toString
    // donors at x = 0, 10, …, 90; two recipients between grid points
    val base = ((0 until 10).map(i => (i.toLong, Some(100.0 + i), i * 10.0))
      ++ Seq((100L, Option.empty[Double], 7.0),
             (101L, Option.empty[Double], 33.0)))
      .toDF("id", "v", "x")
    KnnImpute.writeDonorIndex(base, "id", "v", Seq("x"),
      table = "knn_incr_donors", path = tmp, numCells = 3)
    def serve() = KnnImpute.imputeServe(spark, "knn_incr_donors", tmp,
        base, "id", "v", Seq("x"), k = 1, nProbe = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // nProbe = all cells ⇒ exact nearest donor: x=7 → donor x=10
    // (v=101); x=33 → donor x=30 (v=103)
    val before = serve()
    assert(before(100L) === 101.0 && before(101L) === 103.0)
    // merge two closer donors; frozen stats/centroids, immediate serve
    val d2 = Seq((50L, Some(555.0), 6.0), (51L, Some(777.0), 34.0))
      .toDF("id", "v", "x")
    KnnImpute.mergeDonorIndex(spark, "knn_incr_donors", tmp, d2,
      "id", "v", Seq("x"))
    val after = serve()
    assert(after(100L) === 555.0 && after(101L) === 777.0)
    // known cells untouched throughout
    assert(after(3L) === 103.0)
    // the merged table is the union under the frozen model: 12 donors
    assert(spark.table("knn_incr_donors").count() === 12)
  }

  test("reference-style invariants on real data") {
    val li = Tables.lineitem(spark, sf0001)
      .filter(pmod(col("l_orderkey"), lit(20L)) === 0)
      .withColumn("__mkey", expr("(l_orderkey * 8 + l_linenumber)"))
      .withColumn("__key", expr(
        "(((l_orderkey * 8 + l_linenumber) * 32768 + l_partkey) * 1024 + l_suppkey)"))
    val withMissing = Noise.injectMissing(li, "l_extendedprice",
      "__mkey", salt = 43, frac = 0.10)
    assert(withMissing.select("__key").distinct().count()
      === withMissing.count(), "__key must be unique")
    assert(withMissing.filter(col("l_extendedprice").isNull).count() > 0)
    val out = KnnImpute.impute(withMissing, "__key", "l_extendedprice",
      Seq("l_quantity", "l_discount", "l_tax"), k = 5).cache()
    // (i) no nulls remain (features are complete on this table)
    assert(out.filter(col("l_extendedprice").isNull).count() === 0)
    // (ii) originally-known cells are bit-identical
    val known = withMissing.filter(col("l_extendedprice").isNotNull)
      .select(col("__key"), col("l_extendedprice").as("orig"))
    assert(out.join(known, "__key")
      .filter(col("l_extendedprice") =!= col("orig")).count() === 0)
    // (iii) imputed values sit inside the donor range
    val Array(mn, mx) = known.agg(min("orig"), max("orig"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val imputedRows = out.join(known, Seq("__key"), "left_anti")
    assert(imputedRows.filter(col("l_extendedprice") < mn ||
      col("l_extendedprice") > mx).count() === 0)
  }

  test("ANN candidates reproduce the exact imputer on ≥95% of cells") {
    // the driver-surface shape (impute_lineitem_knn_ann at sf0.01):
    // same slice, same missingness — the contract the query ships under
    val li = Tables.lineitem(spark, sf001)
      .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
      .withColumn("__mkey", expr("(l_orderkey * 8 + l_linenumber)"))
      .withColumn("__key", expr(
        "(((l_orderkey * 8 + l_linenumber) * 32768 + l_partkey) * 1024 + l_suppkey)"))
    val withMissing = Noise.injectMissing(li, "l_extendedprice",
      "__mkey", salt = 43, frac = 0.10)
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val missingKeys = withMissing.filter(col("l_extendedprice").isNull)
      .select(col("__key"))
    def imputedCells(df: org.apache.spark.sql.DataFrame) =
      df.join(missingKeys, "__key")
        .select(col("__key"), col("l_extendedprice").as("v"))
    val exact = imputedCells(KnnImpute.impute(withMissing, "__key",
      "l_extendedprice", feats, k = 5))
    val ann = imputedCells(KnnImpute.imputeAnn(withMissing, "__key",
      "l_extendedprice", feats, k = 5))
    val n = exact.count()
    assert(n > 100, s"fixture too small: $n imputed cells")
    // bit-equal cells: when the probed cells contain the true top-5
    // donors the ANN tail IS the exact tail (same d² fold, same rank,
    // same decimal mean) — only boundary recipients may differ
    val agree = exact.withColumnRenamed("v", "ve")
      .join(ann.withColumnRenamed("v", "va"), "__key")
      .filter(col("ve") === col("va")).count()
    assert(agree.toDouble / n >= 0.95,
      s"only $agree / $n imputed cells match the exact imputer")
    // and determinism: a relayout changes nothing
    val again = imputedCells(KnnImpute.imputeAnn(
      withMissing.repartition(13), "__key", "l_extendedprice", feats, k = 5))
    assert(again.withColumnRenamed("v", "va").join(
      ann.withColumnRenamed("v", "vb"), "__key")
      .filter(col("va") =!= col("vb")).count() === 0)
  }

  test("rows with a null feature keep a null target (no geometry, no guess)") {
    val df = Seq(
      (1L, Some(10.0), Some(0.0)),
      (2L, Some(20.0), Some(1.0)),
      (3L, Option.empty[Double], Option.empty[Double]))
      .toDF("id", "v", "x")
    val out = KnnImpute.impute(df, "id", "v", Seq("x"), k = 1)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(3L).isEmpty)
  }

  test("served imputation ≡ imputeAnn; donor side joins with no Exchange") {
    val li = Tables.lineitem(spark, sf001)
      .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
      .withColumn("__mkey", expr("(l_orderkey * 8 + l_linenumber)"))
      .withColumn("__key", expr(
        "(((l_orderkey * 8 + l_linenumber) * 32768 + l_partkey) * 1024 + l_suppkey)"))
    val withMissing = Noise.injectMissing(li, "l_extendedprice",
      "__mkey", salt = 43, frac = 0.10)
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val tbl = "graft_knn_donors_spec"
    val tmp = java.nio.file.Files.createTempDirectory("knn_idx").toString
    KnnImpute.writeDonorIndex(withMissing, "__key", "l_extendedprice",
      feats, table = tbl, path = tmp)
    val served = KnnImpute.imputeServe(spark, tbl, tmp, withMissing,
      "__key", "l_extendedprice", feats, k = 5)
    val fresh = KnnImpute.imputeAnn(withMissing, "__key",
      "l_extendedprice", feats, k = 5)
    // identical end to end: same stats → same scaling → same
    // deterministic fit → same cells → same candidates → same tail
    val diff = served.select(col("__key"), col("l_extendedprice").as("vs"))
      .join(fresh.select(col("__key"), col("l_extendedprice").as("vf")),
        "__key")
      .filter(col("vs") =!= col("vf") ||
        (col("vs").isNull !== col("vf").isNull)).count()
    assert(diff === 0, s"$diff served cells differ from fresh imputeAnn")
    // the serving point: the bucketed donor table is read IN PLACE —
    // only the batch side (__qcell) may exchange (the IvfIndexSpec
    // assert, applied to the donor table). Force the shuffle-join
    // family so a broadcast cannot hide the property.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val again = KnnImpute.imputeServe(spark, tbl, tmp, withMissing,
        "__key", "l_extendedprice", feats, k = 5)
      again.collect()
      val physical = again.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(physical.contains("Bucketed: true"),
        s"donor scan not bucketed:\n${physical.take(2000)}")
      assert(!physical.contains("Exchange hashpartitioning(__cell"),
        s"the DONOR side shuffled:\n${physical.take(2000)}")
      // pin the at-scale join FAMILY, not just the absence of a donor
      // exchange: with broadcast off, the candidate join must be the
      // bucketed sort-merge (the shape a corpus-scale donor index
      // serves under), and the BATCH side must really shuffle to meet
      // it (__qcell exchange present) — i.e. the zero-donor-Exchange
      // assert is non-trivial, not satisfied by an empty plan
      assert(physical.contains("SortMergeJoin"),
        s"candidate join is not the bucketed SMJ:\n${physical.take(2000)}")
      assert(physical.contains("Exchange hashpartitioning(__qcell"),
        s"batch side did not shuffle to meet the bucketed donors " +
          s"(assert would be vacuous):\n${physical.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
