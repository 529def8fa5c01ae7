package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order must make EVERY clustered column's zone maps selective at
  * once, stay exactly equal to the unclustered read, and degrade to
  * correct-but-unpruned on adversarial shapes (constant columns,
  * nulls). */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/zo_spec_${tag}_" +
      java.util.UUID.randomUUID().toString.take(8)
    VersionedTable.drop(spark, d)
    d
  }

  test("both z columns prune after compactZOrder; results ≡ the full " +
    "filter; single-column clustering only prunes its own column") {
    val dir = freshDir("zboth")
    // a 100×100 grid: x and y are independent — single-column sort
    // can never make both selective
    val grid = (for (x <- 1 to 100; y <- 1 to 100)
      yield (x.toLong, y.toLong, s"r$x-$y")).toDF("x", "y", "s")
    VersionedTable.publish(grid.repartition(8), dir, "b1")
    val (before, after) = ZOrder.compactZOrder(spark, dir,
      Seq("x", "y"), minFiles = 16)
    assert(after >= 16, s"expected >=16 z files, got $after")
    val v = VersionedTable.latestVersion(spark, dir).get
    // a 10% band on EACH dimension prunes
    val (dx, ox, tx) = VersionedTable.readAsOfPruned(spark, dir, v,
      "x", 40.0, 50.0)
    assert(ox < tx, s"x pruning must fire: $ox of $tx")
    assert(dx.count() === grid.filter(col("x").between(40, 50)).count())
    val (dy, oy, ty) = VersionedTable.readAsOfPruned(spark, dir, v,
      "y", 40.0, 50.0)
    assert(oy < ty, s"y pruning must fire: $oy of $ty")
    assert(dy.count() === grid.filter(col("y").between(40, 50)).count())
    // exact content equality on a joint predicate
    val got = dx.filter(col("y").between(70, 80))
      .select("s").as[String].collect().toSet
    val want = grid.filter(col("x").between(40, 50) &&
      col("y").between(70, 80)).select("s").as[String].collect().toSet
    assert(got === want)
    // crash-replay protection: the batchId for the SAME source
    // version is already committed, so a retried z-order of v1
    // writes nothing new (the committedVersionOf gate)
    assert(VersionedTable.committedVersionOf(spark, dir,
      "zorder-of-v1").isDefined)
    assert(before === 8)
    VersionedTable.drop(spark, dir)
  }

  test("adversarial shapes: constant column and nulls stay exact " +
    "(clustered to 0, residual filter applies)") {
    val dir = freshDir("zadv")
    val df = (1L to 1000L).map(i =>
      (i, if (i % 10 == 0) None else Some(i.toDouble), 7L))
      .toDF("id", "v", "const")
    VersionedTable.publish(df.repartition(4), dir, "b1")
    ZOrder.compactZOrder(spark, dir, Seq("v", "const"), minFiles = 8)
    val v = VersionedTable.latestVersion(spark, dir).get
    val (d1, o1, t1) = VersionedTable.readAsOfPruned(spark, dir, v,
      "v", 100.0, 200.0)
    assert(o1 < t1, s"v pruning must still fire: $o1 of $t1")
    assert(d1.count() === df.filter(
      col("v").between(100.0, 200.0)).count())
    // constant column: everything maps to one cell — no pruning
    // possible, but the read stays exact
    val (d2, _, _) = VersionedTable.readAsOfPruned(spark, dir, v,
      "const", 7.0, 7.0)
    assert(d2.count() === 1000L)
    // nulls never satisfy a range predicate (SQL semantics)
    assert(VersionedTable.readAsOf(spark, dir, v)
      .filter(col("v").isNull).count() === 100L)
    assert(d1.filter(col("v").isNull).count() === 0L)
    VersionedTable.drop(spark, dir)
  }

  test("zValue: bit interleaving is monotone per dimension and " +
    "rejects over-wide configurations") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq("a", "b", "c", "d"),
        Map.empty.withDefaultValue((0.0, 1.0)), bits = 16)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq("a"), Map.empty, bits = 16) // missing range
    }
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
      .toDF("a", "b")
    val ranges = Map("a" -> (0.0, 1.0), "b" -> (0.0, 1.0))
    val z = df.select(ZOrder.zValue(Seq("a", "b"), ranges, bits = 2)
      .as("z")).as[Long].collect()
    // cells: (0,0)=0, (3,0)=interleave(11,00)=0b0101=5,
    // (0,3)=0b1010=10, (3,3)=0b1111=15
    assert(z.toSeq === Seq(0L, 5L, 10L, 15L))
  }
}
