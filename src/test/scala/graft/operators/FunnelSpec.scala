package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private def ev(rows: (Long, Int, String)*) =
    rows.map { case (u, m, t) => (u, ts(m), t) }
      .toDF("user_id", "ts", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame,
                  steps: Seq[String] = Seq("signup", "click", "purchase")) =
    Funnel.funnel(df, steps).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("ordered completion counts, with drop-off") {
    val df = ev(
      // user 1: full ordered funnel
      (1L, 0, "signup"), (1L, 5, "click"), (1L, 9, "purchase"),
      // user 2: signup + click, no purchase
      (2L, 0, "signup"), (2L, 3, "click"),
      // user 3: purchase BEFORE signup → only step 1 counts
      (3L, 1, "purchase"), (3L, 2, "signup"),
      // user 4: never signed up → counts nowhere
      (4L, 0, "click"), (4L, 1, "purchase"))
    assert(run(df) === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("strict ordering: same-timestamp events do not advance the funnel") {
    val df = ev((1L, 5, "signup"), (1L, 5, "click"))
    assert(run(df) === Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("first-touch: earliest qualifying event starts the clock") {
    // click at t=1 precedes the FIRST signup (t=2) so it must not
    // count; the next click is t=8, and the only purchase (t=3) sits
    // before it — an any-order funnel would report full conversion,
    // first-touch strict ordering stops at step 2
    val df = ev(
      (1L, 1, "click"), (1L, 2, "signup"), (1L, 3, "purchase"),
      (1L, 8, "click"))
    assert(run(df) === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("counts are monotonically non-increasing across steps") {
    val df = graft.Tables.events(spark, sf0001)
    val counts = Funnel.funnel(df, Seq("signup", "click", "purchase"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(counts.length === 3 && counts.head > 0)
    assert(counts.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("plan: one hash shuffle; per-user collapse reuses the window partitioning") {
    val df = Funnel.funnel(graft.Tables.events(spark, sf0001),
      Seq("signup", "click", "purchase"))
    df.collect()
    // final executed section only (AQE toString appends "Initial Plan")
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val hashExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).size
    assert(hashExchanges === 1,
      s"expected exactly 1 hash shuffle (user_id), got $hashExchanges:\n$p")
    // step-type filter must reach the parquet scan
    val q = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(q.contains("PushedFilters") && q.contains("event_type"),
      "event_type filter not pushed to scan")
  }
}
