package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized equivalence of the two-level prefix-sum operators with
  * their naive single-window forms — sparse/duplicate-free random ids,
  * zero weights, and tiny block sizes, the shapes the fixed corpus
  * tests don't reach. Few ScalaCheck rounds (each case runs Spark
  * jobs), many rows per case. */
class PrefixSumPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("globalOffsets == naive cumsum on random sparse frames") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      ids <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L)).map(_.distinct)
      ws <- Gen.listOfN(ids.size, Gen.chooseNum(0L, 500L))
      blockSize <- Gen.oneOf(1L, 3L, 64L, 1L << 20)
    } yield (ids.zip(ws), blockSize)
    check(Prop.forAll(gen) { case (rows, blockSize) =>
      val df = rows.toDF("id", "w")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val naive = df.withColumn("start_off", coalesce(sum(col("w")).over(w), lit(0L)))
        .select("id", "start_off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Packing.globalOffsets(df, "id", "w", blockSize)
        .select("id", "start_off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == naive
    })
  }

  test("selectToBudget == naive windowed prefix filter on random frames") {
    val gen = for {
      n <- Gen.chooseNum(1, 50)
      ids <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L)).map(_.distinct)
      // coarse quality grid so ties (shared bins) actually occur
      qs <- Gen.listOfN(ids.size, Gen.chooseNum(0, 5).map(_ / 10.0))
      ts <- Gen.listOfN(ids.size, Gen.chooseNum(1L, 100L))
      budget <- Gen.chooseNum(0L, 2000L)
    } yield (ids.lazyZip(qs).lazyZip(ts).toList, budget)
    check(Prop.forAll(gen) { case (rows, budget) =>
      val df = rows.toDF("id", "q", "t")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("q").desc, col("id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val naive = df.withColumn("off", coalesce(sum(col("t")).over(w), lit(0L)))
        .filter(col("off") + col("t") <= budget)
        .select("id").collect().map(_.getLong(0)).toSet
      val got = BudgetSelect.selectToBudget(df, "id", "q", "t", budget)
        .select("id").collect().map(_.getLong(0)).toSet
      got == naive
    })
  }
}
