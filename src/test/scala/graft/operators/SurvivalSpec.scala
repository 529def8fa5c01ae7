package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {

  import spark.implicits._

  test("textbook KM: censoring shrinks the risk set without an event row") {
    // durations (bucket=1): E@1, C@2, E@3, E@3, C@5
    // t=1: n=5, d=1 → S=0.8; t=3: at-risk {3,3,5}=3, d=2 → S=0.8·(1/3)
    val ps = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (5L, 0))
      .toDF("duration", "event")
    val out = Survival.kaplanMeier(ps, "duration", "event", bucketUs = 1L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === ((1L, 5L, 0.8)))
    assert(out(3L)._1 === 2L && out(3L)._2 === 3L)
    assert(math.abs(out(3L)._3 - 0.8 / 3.0) < 1e-6)
  }

  test("everyone-converts terminal bucket lands S exactly at 0") {
    val ps = Seq((1L, 1), (2L, 1)).toDF("duration", "event")
    val out = Survival.kaplanMeier(ps, "duration", "event", bucketUs = 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) === 0.5 && out(2L) === 0.0)
  }

  test("cohort curves equal the single-cohort estimator run per cohort") {
    val a = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (5L, 0))
    val b = Seq((1L, 1), (2L, 1), (4L, 0))
    val ps = (a.map { case (d, e) => ("A", d, e) } ++
      b.map { case (d, e) => ("B", d, e) }).toDF("cohort", "duration", "event")
    val out = Survival.kaplanMeierCohorts(ps, "duration", "event", "cohort",
        bucketUs = 1L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    def single(rows: Seq[(Long, Int)]) =
      Survival.kaplanMeier(rows.toDF("duration", "event"), "duration",
          "event", bucketUs = 1L)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    val sa = single(a); val sb = single(b)
    assert(out.keys.count(_._1 == "A") === sa.size)
    sa.foreach { case (t, v) => assert(out(("A", t)) === v) }
    sb.foreach { case (t, v) => assert(out(("B", t)) === v) }
  }

  test("log-rank: hand-computed two-cohort fixture") {
    // A: E@1, E@2; B: E@1, C@2.
    // t=1: n1=2, n=4, d=2, d1=1 → u=0,   E1=1,   V=2·¼·½·⅔... =1/3
    //      V = d·(n1/n)·(n2/n)·(n−d)/(n−1) = 2·0.5·0.5·(2/3) = 1/3
    // t=2: n1=1, n=2, d=1, d1=1 → u=0.5, E1=0.5, V=1·0.5·0.5·1 = 0.25
    // χ² = 0.5² / (1/3 + 1/4) = 0.25/0.583̄ = 0.428571
    val ps = Seq(("A", 1L, 1), ("A", 2L, 1), ("B", 1L, 1), ("B", 2L, 0))
      .toDF("cohort", "duration", "event")
    val r = Survival.logRank(ps, "duration", "event", "cohort", bucketUs = 1L)
      .head()
    assert(r.getString(0) === "A")
    assert(r.getLong(1) === 2L)          // observed events in A
    assert(r.getDouble(2) === 1.5)       // expected events in A
    assert(r.getDouble(3) === 0.428571)  // χ², 6-dp
  }

  test("log-rank: identical cohorts give χ² exactly 0") {
    val one = Seq((1L, 1), (2L, 1), (3L, 0))
    val ps = (one.map { case (d, e) => ("A", d, e) } ++
      one.map { case (d, e) => ("B", d, e) }).toDF("cohort", "duration", "event")
    val r = Survival.logRank(ps, "duration", "event", "cohort", bucketUs = 1L)
      .head()
    assert(r.getDouble(3) === 0.0)
    assert(r.getLong(1) === 2L && r.getDouble(2) === 2.0)
  }

  test("log-rank: single-subject terminal bucket (n=1) contributes V=0") {
    // B's last subject alone at t=3: n=1, d=1 — the (n−1) guard must
    // yield V=0 there, not a division by zero
    val ps = Seq(("A", 1L, 1), ("B", 3L, 1)).toDF("cohort", "duration", "event")
    val r = Survival.logRank(ps, "duration", "event", "cohort", bucketUs = 1L)
      .head()
    assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
  }

  test("Nelson–Aalen: hand-computed hazard, non-decreasing") {
    // E@1 (n=5), C@2, 2×E@3 (n=3), C@5 → H(1)=1/5, H(3)=1/5+2/3
    val ps = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (5L, 0))
      .toDF("duration", "event")
    val out = Survival.nelsonAalen(ps, "duration", "event", bucketUs = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === ((1L, 5L, 0.2)))
    assert(out(3L)._1 === 2L && out(3L)._2 === 3L)
    assert(math.abs(out(3L)._3 - (0.2 + 2.0 / 3)) < 1e-6)
  }

  test("RMST: step-function integral by hand; event-free = horizon") {
    // E@2 (n=2, S=0.5), E@5 (S=0), τ=8:
    // rmst = 2·1 + (5−2)·0.5 + (8−5)·0 = 3.5
    val ps = Seq((2L, 1), (5L, 1)).toDF("duration", "event")
    val r = Survival.rmst(ps, "duration", "event", bucketUs = 1L,
      horizonBuckets = 8L).head()
    assert(r.getLong(0) === 8L && r.getDouble(1) === 3.5)
    // censoring-only corpus: S = 1 everywhere → rmst = τ
    val cens = Seq((3L, 0), (9L, 0)).toDF("duration", "event")
    val c = Survival.rmst(cens, "duration", "event", bucketUs = 1L,
      horizonBuckets = 8L).head()
    assert(c.getDouble(1) === 8.0)
    // horizon caps: events beyond τ don't count
    val late = Seq((2L, 1), (50L, 1)).toDF("duration", "event")
    val l = Survival.rmst(late, "duration", "event", bucketUs = 1L,
      horizonBuckets = 8L).head()
    // S=0.5 after t=2 through τ: rmst = 2 + 6·0.5 = 5
    assert(l.getDouble(1) === 5.0)
  }

  test("survival is monotone non-increasing on real conversions") {
    val perUser = graft.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(
        org.apache.spark.sql.functions.expr("min(unix_micros(ts))").as("t0"),
        org.apache.spark.sql.functions.expr(
          "min(CASE WHEN event_type = 'purchase' THEN unix_micros(ts) END)").as("tp"),
        org.apache.spark.sql.functions.expr("max(unix_micros(ts))").as("tl"))
      .selectExpr(
        "CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE tl - t0 END AS duration",
        "CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event")
    val s = Survival.kaplanMeier(perUser, "duration", "event",
        bucketUs = 3600000000L)
      .orderBy("t_bucket").collect().map(_.getDouble(4))
    assert(s.nonEmpty && s.head <= 1.0)
    assert(s.sliding(2).forall(w => w.length < 2 || w(1) <= w(0) + 1e-12))
  }

  test("competing risks: hand-computed Aalen–Johansen, identity holds") {
    import spark.implicits._
    // bucket 1: A cause1, B cause2 (of 4 at risk); bucket 2: C cause1
    // (of 2); bucket 3: D censored
    val ps = Seq((1L, 1), (1L, 2), (2L, 1), (3L, 0))
      .toDF("duration", "event")
    val r = Survival.competingRisks(ps, "duration", "event", bucketUs = 1L)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(4), x.getDouble(5), x.getDouble(6)))
      .toMap
    assert(r(1L) === ((4L, 1.0, 0.25, 0.25)), r.toString)
    // surv_prev(2) = 1 − 2/4 = .5; cif_1 += .5·(1/2) = .5
    assert(r(2L) === ((2L, 0.5, 0.5, 0.25)), r.toString)
    // identity at the last event bucket: CIF1 + CIF2 + S = 1
    val sAfter = 0.5 * 0.5 // all-cause KM through bucket 2
    assert(math.abs(r(2L)._3 + r(2L)._4 + sAfter - 1.0) < 1e-9)
  }

  test("competing risks: 1−KM (cause-2-as-censoring) overstates CIF") {
    import spark.implicits._
    val ps = Seq((1L, 1), (1L, 2), (2L, 1), (3L, 0))
      .toDF("duration", "event")
    val cif1 = Survival.competingRisks(ps, "duration", "event", 1L)
      .orderBy($"t_bucket".desc).head.getDouble(5)
    // the WRONG estimate: cause 2 treated as censoring
    val naive = Survival.kaplanMeier(
      ps.select($"duration",
        org.apache.spark.sql.functions.when($"event" === 1, 1)
          .otherwise(0).as("event")),
      "duration", "event", 1L)
      .orderBy($"t_bucket".desc).head.getDouble(4)
    assert(1.0 - naive > cif1 + 0.05,
      s"naive ${1.0 - naive} must overstate AJ $cif1")
  }
}
