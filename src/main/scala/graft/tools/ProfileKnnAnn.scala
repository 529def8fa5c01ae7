package graft.tools

import graft.Tables
import graft.functions.Noise
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of KnnImpute.imputeAnn — where do the seconds
  * go at sf0.1 (fit? probes? candidate join?), and how does the cell
  * count move them. Usage: runMain graft.tools.ProfileKnnAnn [sfDir]
  * [cells ...] */
object ProfileKnnAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cellGrid = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(0, 64, 32)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[knn-ann] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = Tables.lineitem(spark, sfDir)
      .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
      .withColumn("__mkey", expr("(l_orderkey * 8 + l_linenumber)"))
      .withColumn("__key", expr(
        "(((l_orderkey * 8 + l_linenumber) * 32768 + l_partkey) * 1024 + l_suppkey)"))
    val withMissing = Noise.injectMissing(li, "l_extendedprice",
      "__mkey", salt = 43, frac = 0.10).localCheckpoint()
    println(s"[knn-ann] rows=${withMissing.count()}")

    cellGrid.foreach { nc =>
      timed(s"imputeAnn cells=$nc end-to-end") {
        graft.impute.KnnImpute.imputeAnn(withMissing, "__key",
            "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"),
            k = 5, numCells = nc)
          .filter(col("l_extendedprice").isNotNull)
          .agg(sum(col("l_extendedprice"))).collect()
      }
    }

    // stage split at the default cell count
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val featOk = feats.map(col(_).isNotNull).reduce(_ && _)
    val donors = withMissing.filter(col("l_extendedprice").isNotNull && featOk)
    val stats = donors.agg(
      feats.flatMap(c => Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))).head,
      feats.flatMap(c => Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))).tail: _*)
    def scaledVec = array(feats.map(c =>
      graft.impute.Scaling.scale(col(c).cast("double"),
        col(s"__mn_$c"), col(s"__mx_$c"))): _*)
    val donorSide = donors
      .select(col("__key").as("__did"),
        col("l_extendedprice").cast("decimal(18,2)").as("__dv"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .crossJoin(broadcast(stats))
      .withColumn("__vec", scaledVec)
      .select("__did", "__dv", "__vec")
    val nDonors = timed("donor count")(donorSide.count())
    val cells = math.max(2, math.min(256,
      math.ceil(math.sqrt(nDonors.toDouble)).toInt))
    println(s"[knn-ann] donors=$nDonors cells=$cells")
    val model = timed(s"KMeansLloyd.fit k=$cells iters=3")(
      graft.ml.KMeansLloyd.fit(donorSide, "__did", "__vec", cells, 3))
    timed("donor assignment pass")(
      donorSide.withColumn("__cell", element_at(
        graft.ml.KMeansLloyd.probeCells(col("__vec"), model, 1), 1))
        .agg(sum(col("__cell"))).collect())

    // micro-variants: where does the per-row cost live?
    val dcp = donorSide.localCheckpoint()
    val qd = dcp.withColumn("__q", graft.ml.KMeansLloyd.quantize(col("__vec")))
      .localCheckpoint()
    timed("quantize only")(
      dcp.select(graft.ml.KMeansLloyd.quantize(col("__vec")).as("q"))
        .agg(sum(element_at(col("q"), 1))).collect())
    val cmat = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i.toLong).as("i"),
        array(c.toIndexedSeq.map(lit): _*).as("c"))
    }.toIndexedSeq: _*)
    def dists(q: org.apache.spark.sql.Column) =
      transform(cmat, s => struct(
        aggregate(zip_with(q, s.getField("c"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v).as("d"),
        s.getField("i").as("i")))
    timed("dists from MATERIALIZED q, no sort")(
      qd.select(array_min(dists(col("__q"))).getField("i").as("c"))
        .agg(sum(col("c"))).collect())
    timed("dists from MATERIALIZED q, array_sort")(
      qd.select(element_at(transform(slice(array_sort(dists(col("__q"))), 1, 1),
          s => s.getField("i")), 1).as("c"))
        .agg(sum(col("c"))).collect())
    timed("dists from INLINE quantize, no sort")(
      dcp.select(array_min(dists(graft.ml.KMeansLloyd.quantize(col("__vec"))))
          .getField("i").as("c"))
        .agg(sum(col("c"))).collect())
    spark.stop()
  }
}
