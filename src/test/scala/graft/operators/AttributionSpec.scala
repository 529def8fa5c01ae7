package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // A: view → click → purchase;  B: view → purchase;
  // C: click → (drop);           D: view → (drop)
  // Chain: START(view 3/4, click 1/4), view(click/CONV/NULL 1/3 each),
  // click(CONV/NULL 1/2 each) → P(conv) = 1/2 EXACTLY on the integer
  // grid (all divisions land without remainder).
  private def journeys = Seq(
    ("A", 1L, 1L, "view"), ("A", 2L, 2L, "click"), ("A", 3L, 3L, "purchase"),
    ("B", 1L, 4L, "view"), ("B", 2L, 5L, "purchase"),
    ("C", 1L, 6L, "click"),
    ("D", 1L, 7L, "view"))
    .map { case (u, t, e, st) => (u, ts(t), e, st) }
    .toDF("user_id", "ts", "event_id", "event_type")

  test("hand-computed removal effects on the exact-grid chain") {
    val r = Attribution.removalEffects(journeys, "user_id", "ts",
      "event_id", "event_type", "purchase")
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
      .toMap
    assert(r.keySet === Set("click", "view"))
    // P(conv) = 1/2; remove view → 1/8, eff 3/4; remove click → 1/4,
    // eff 1/2; shares 0.6 / 0.4
    assert(r("view") === ((0.5, 0.125, 0.75, 0.6)), r.toString)
    assert(r("click") === ((0.5, 0.25, 0.5, 0.4)), r.toString)
  }

  test("journeys are cut at the FIRST conversion") {
    val df = Seq(
      ("E", ts(1), 1L, "purchase"), ("E", ts(2), 2L, "view"),
      ("F", ts(1), 3L, "view"), ("F", ts(2), 4L, "purchase"),
      ("F", ts(3), 5L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val t = Attribution.transitions(df, "user_id", "ts", "event_id",
      "event_type", "purchase")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    // E: START→CONV; F: START→view→CONV. Post-conversion view/click
    // never appear; no NULL tails (both converted).
    assert(t === Map(
      ("__start", "__conv") -> 1L,
      ("__start", "view") -> 1L,
      ("view", "__conv") -> 1L), t.toString)
  }

  test("removal effects on events data are sane and shares sum to ~1") {
    val r = Attribution.removalEffects(graft.Tables.events(spark, sf0001),
      "user_id", "ts", "event_id", "event_type", "purchase").collect()
    assert(r.length === 4, r.map(_.getString(0)).mkString(","))
    r.foreach { x =>
      assert(x.getDouble(3) >= 0 && x.getDouble(3) <= 1, x.toString)
      assert(x.getDouble(2) <= x.getDouble(1) + 1e-9,
        s"removal cannot raise conversion: $x")
    }
    val shareSum = r.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum $shareSum")
  }
}
