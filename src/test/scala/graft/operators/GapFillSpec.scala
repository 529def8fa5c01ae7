package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class GapFillSpec extends SparkSpec {

  import spark.implicits._

  private def h(hour: Int, min: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  test("gaps become explicit zero rows with the value carried forward") {
    val df = Seq(
      (1L, h(0, 10), 5.0), (1L, h(0, 40), 2.5),  // hour 0: 2 events, 7.5
      (1L, h(3, 5), 4.0))                         // hours 1,2 empty
      .toDF("user_id", "ts", "value")
    val out = GapFill.resampleFfill(df, "user_id", "ts", "value")
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(out === Seq(
      (h(0), 2L, 7.5), (h(1), 0L, 7.5), (h(2), 0L, 7.5), (h(3), 1L, 4.0)))
  }

  test("keys do not leak fills into each other; single-event key = one row") {
    val df = Seq(
      (1L, h(0), 1.0), (1L, h(2), 3.0),
      (2L, h(1), 9.0))
      .toDF("user_id", "ts", "value")
    val out = GapFill.resampleFfill(df, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      (1L, h(0), 1L, 1.0), (1L, h(1), 0L, 1.0), (1L, h(2), 1L, 3.0),
      (2L, h(1), 1L, 9.0)))
  }

  test("grid is dense per user on real events; fill rows carry prior values") {
    val out = GapFill.resampleFfill(graft.Tables.events(spark, sf0001),
      "user_id", "ts", "value")
    val perUser = out.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("bucket").as("lo"),
        org.apache.spark.sql.functions.max("bucket").as("hi"))
      .collect()
    perUser.foreach { r =>
      val span = (r.getTimestamp(3).getTime - r.getTimestamp(2).getTime) / 3600000L + 1
      assert(r.getLong(1) === span, s"grid not dense for user ${r.get(0)}")
    }
    // every row after the first per user has a non-null fill
    assert(out.where("v_ffill IS NULL").count() === 0L)
  }
}
