package graft.graph

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LouvainSpec extends SparkSpec {

  import spark.implicits._

  private def q(edges: DataFrame, labels: DataFrame): Double =
    Modularity.modularity(edges, labels)
      .filter(col("label") === -1L).collect().head.getDouble(4)

  // two 4-cliques joined by a single bridge edge — ground-truth
  // communities are the cliques
  private def cliques: DataFrame = {
    val c1 = for (i <- 0 to 3; j <- i + 1 to 3) yield (i.toLong, j.toLong)
    val c2 = for (i <- 10 to 13; j <- i + 1 to 13) yield (i.toLong, j.toLong)
    (c1 ++ c2 :+ (3L, 10L)).toDF("a", "b")
  }

  test("refine recovers the two cliques from singleton labels and " +
    "strictly improves modularity") {
    val e = cliques
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    val singletons = nodes.withColumn("label", col("node"))
    val refined = Louvain.refine(e, singletons, sweeps = 4)
    assert(q(e, refined) > q(e, singletons),
      "local moves must improve Q from the singleton start")
    val lab = refined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.filterKeys(_ <= 3L).values.toSet.size === 1,
      s"clique 1 must share one label: $lab")
    assert(lab.filterKeys(_ >= 10L).values.toSet.size === 1,
      s"clique 2 must share one label: $lab")
    assert(lab(0L) !== lab(10L), "cliques must not merge over the bridge")
  }

  test("trade graph: louvain modularity >= label-propagation's " +
    "(the d115 contract) and >= its own input") {
    val trade = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf0001).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf0001).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val und = trade.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    val lpa = LabelPropagation.communities(trade, rounds = 4)
    val refined = Louvain.refine(und, lpa, sweeps = 4)
    val qLpa = q(und, lpa)
    val qLouvain = q(und, refined)
    assert(qLouvain >= qLpa,
      s"louvain must not degrade the LPA partition: $qLouvain < $qLpa")
  }

  test("a partition already at a local optimum is a fixpoint") {
    val e = cliques
    val good = (0 to 3).map(i => (i.toLong, 0L))
      .++((10 to 13).map(i => (i.toLong, 10L))).toDF("node", "label")
    val refined = Louvain.refine(e, good, sweeps = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = good.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined === before, "optimal labeling must not move")
  }

  test("determinism: two runs produce identical labels") {
    val e = cliques
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    val s0 = nodes.withColumn("label", col("node"))
    val r1 = Louvain.refine(e, s0, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = Louvain.refine(e, s0, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === r2)
  }

  test("two-level: coarsening merges whole communities one-level " +
    "moves cannot — ring of 12 triangle-cliques, singleton start") {
    // 12 triangles in a ring (m = 48): one-level from singletons
    // recovers the triangles; past the Fortunato–Barthélemy resolution
    // limit (c > √(2m) ⇔ c > 8 here) Q improves further by PAIRING
    // adjacent triangles — Q_single = 3/4 − 1/c < Q_pair = 7/8 − 2/c
    // for c > 8 — a whole-community move only the contracted level
    // can take
    val nCliq = 12
    val tri = (0 until nCliq).flatMap { t =>
      val base = t * 10L
      Seq((base, base + 1), (base, base + 2), (base + 1, base + 2))
    }
    val ring = (0 until nCliq).map(t =>
      (t * 10L + 2, ((t + 1) % nCliq) * 10L) match {
        case (x, y) if x < y => (x, y); case (x, y) => (y, x)
      })
    val e = (tri ++ ring).toDF("a", "b")
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    val singletons = nodes.withColumn("label", col("node"))
    val one = Louvain.refine(e, singletons, sweeps = 4)
    val two = Louvain.twoLevel(e, singletons, sweeps = 4)
    val qOne = q(e, one)
    val qTwo = q(e, two)
    assert(qTwo >= qOne,
      s"two-level must not lose to one-level: $qTwo < $qOne")
    val nTwo = two.select(col("label")).distinct().count()
    val nOne = one.select(col("label")).distinct().count()
    assert(nTwo < nOne,
      s"coarsening must merge communities here: $nOne -> $nTwo")
  }

  test("weighted refine: self-loops and weights — contracted two-clique " +
    "graph keeps its communities apart") {
    // contraction of two 4-cliques + bridge: two super-nodes with
    // self-loop weight 6 each, bridge weight 1 — merging them must
    // NOT improve Q, so the identity labeling is a fixpoint
    val e = Seq((0L, 0L, 6L), (1L, 1L, 6L), (0L, 1L, 1L)).toDF("a", "b", "w")
    val ident = Seq((0L, 0L), (1L, 1L)).toDF("node", "label")
    val r = Louvain.refineWeighted(e, ident, sweeps = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 0L, 1L -> 1L))
  }

  test("connectivity pass splits a stranded disconnected community " +
    "and Q does not decrease (the Leiden guarantee)") {
    // two triangles with NO edge between them, all forced into ONE
    // community: strict-gain local moves cannot split it (every node's
    // only candidate is its own community), so plain refine leaves a
    // disconnected community — exactly the Leiden defect
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val oneCommunity = Seq(0L, 1L, 2L, 10L, 11L, 12L)
      .map(n => (n, 0L)).toDF("node", "label")
    val refined = Louvain.refine(e, oneCommunity, sweeps = 4)
    assert(refined.select(col("label")).distinct().count() === 1L,
      "plain local moves must leave the stranded community intact " +
        "(the fixture premise)")
    val split = Louvain.connectivityPass(e, refined)
    val lab = split.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L),
      s"components must split to min-member labels: $lab")
    assert(q(e, split) > q(e, refined),
      "splitting a zero-edge-coupled community must raise Q")
    // leiden = refine + split in one call
    val viaLeiden = Louvain.leiden(e, oneCommunity, sweeps = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLeiden === lab)
  }

  test("connectivity pass is the identity on connected min-labeled " +
    "communities") {
    val good = (0 to 3).map(i => (i.toLong, 0L))
      .++((10 to 13).map(i => (i.toLong, 10L))).toDF("node", "label")
    val out = Louvain.connectivityPass(cliques, good)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === good.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("two-level leiden keeps the resolution-limit win and never " +
    "loses modularity to the unguarded two-level") {
    val nCliq = 12
    val tri = (0 until nCliq).flatMap { t =>
      val base = t * 10L
      Seq((base, base + 1), (base, base + 2), (base + 1, base + 2))
    }
    val ring = (0 until nCliq).map(t =>
      (t * 10L + 2, ((t + 1) % nCliq) * 10L) match {
        case (x, y) if x < y => (x, y); case (x, y) => (y, x)
      })
    val e = (tri ++ ring).toDF("a", "b")
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    val singletons = nodes.withColumn("label", col("node"))
    val one = Louvain.refine(e, singletons, sweeps = 4)
    val leiden2 = Louvain.leidenTwoLevel(e, singletons, sweeps = 4)
    assert(q(e, leiden2) >= q(e, one),
      "two-level leiden must not lose to one-level refine")
    assert(leiden2.select(col("label")).distinct().count() <
      one.select(col("label")).distinct().count(),
      "the contracted level must still merge past the resolution limit")
  }

  test("adaptive small-graph driver path produces EXACTLY the " +
    "distributed labels (weighted, self-loops, isolated nodes)") {
    // pseudo-random-ish weighted graph + a self-loop + an isolated
    // labeled node (no degree row: must never move on either path)
    val e = ((0 until 60).map { i =>
      val a = (i * 7) % 23; val b = (i * 13 + 5) % 23
      (math.min(a, b).toLong, math.max(a, b).toLong,
        1L + (i % 3))
    } :+ ((3L, 3L, 4L))).toDF("a", "b", "w")
    val nodes = (0L to 23L) :+ 99L // 99 is isolated
    val lab = nodes.map(n => (n, n % 5)).toDF("node", "label")
    for (sweeps <- Seq(1, 3, 4)) {
      val drv = Louvain.refineWeighted(e, lab, sweeps)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Louvain.refineWeighted(e, lab, sweeps,
        smallGraphMax = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(drv === dist, s"driver != distributed at sweeps=$sweeps")
      assert(drv(99L) === 99L % 5, "isolated node must keep its label")
    }
  }

  test("composed two-level / leiden driver paths produce EXACTLY the " +
    "distributed labels") {
    // the same pseudo-random-ish graph as the one-level driver test,
    // unweighted (the two-level entry points take (a, b)), plus an
    // isolated labeled node; compare the fully-composed driver run
    // against the forced-distributed run for every composition
    val e = (0 until 60).map { i =>
      val a = (i * 7) % 23; val b = (i * 13 + 5) % 23
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(p => p._1 != p._2).distinct.toDF("a", "b")
    val nodes = (0L to 23L) :+ 99L
    val lab = nodes.map(n => (n, n % 5)).toDF("node", "label")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (sweeps <- Seq(1, 4)) {
      assert(asMap(Louvain.twoLevel(e, lab, sweeps)) ===
        asMap(Louvain.twoLevel(e, lab, sweeps, smallGraphMax = 0L)),
        s"twoLevel driver != distributed at sweeps=$sweeps")
      assert(asMap(Louvain.leiden(e, lab, sweeps)) ===
        asMap(Louvain.leiden(e, lab, sweeps, smallGraphMax = 0L)),
        s"leiden driver != distributed at sweeps=$sweeps")
      assert(asMap(Louvain.leidenTwoLevel(e, lab, sweeps)) ===
        asMap(Louvain.leidenTwoLevel(e, lab, sweeps, smallGraphMax = 0L)),
        s"leidenTwoLevel driver != distributed at sweeps=$sweeps")
    }
    // stranded-bridge fixture: the connectivity split must fire
    // identically on both paths (two zero-coupled triangles forced
    // into one community split to min-member labels)
    val tri2 = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val oneCommunity = Seq(0L, 1L, 2L, 10L, 11L, 12L)
      .map(n => (n, 0L)).toDF("node", "label")
    assert(asMap(Louvain.leiden(tri2, oneCommunity, 4)) ===
      asMap(Louvain.leiden(tri2, oneCommunity, 4, smallGraphMax = 0L)))
    assert(asMap(Louvain.leidenTwoLevel(tri2, oneCommunity, 4)) ===
      asMap(Louvain.leidenTwoLevel(tri2, oneCommunity, 4,
        smallGraphMax = 0L)))
  }

  test("overflow bound is ENFORCED: 2*m*max(k) past BIGINT fails " +
    "loudly instead of wrapping") {
    val e = Seq((0L, 1L, 1L << 61)).toDF("a", "b", "w")
    val lab = Seq((0L, 0L), (1L, 1L)).toDF("node", "label")
    val ex = intercept[IllegalArgumentException] {
      Louvain.refineWeighted(e, lab, sweeps = 1)
    }
    assert(ex.getMessage.contains("overflow bound"))
  }

  test("empty edges / zero sweeps are rejected") {
    val lab = Seq((1L, 1L)).toDF("node", "label")
    intercept[IllegalArgumentException] {
      Louvain.refine(Seq.empty[(Long, Long)].toDF("a", "b"), lab, 1)
        .collect()
    }
    intercept[IllegalArgumentException] {
      Louvain.refine(cliques, lab, 0)
    }
  }
}
