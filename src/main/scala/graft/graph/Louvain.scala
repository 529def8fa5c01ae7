package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LOUVAIN ONE-LEVEL REFINEMENT — the modularity-IMPROVING member the
  * graph family was missing: [[LabelPropagation]] emits labels,
  * [[Modularity]] only SCORES them; this operator greedily moves
  * nodes between communities while the move's modularity gain is
  * positive (the local-move phase of Blondel et al. 2008 — one level,
  * no graph coarsening, which is where most of Louvain's Q gain
  * comes from on small-diameter graphs).
  *
  * Gain arithmetic, exact integers only: moving node i into community
  * c (after removal from its own) changes Q by
  *
  *   ΔQ ∝ score(c) = 2m·k_{i,c} − k_i·d_{c∖i}
  *
  * (k_{i,c} = i's edges into c, d_c = Σ degree of c's members, the
  * (2m²) denominator dropped as common). i moves to the argmax
  * candidate — neighbor communities ∪ its own — iff that score
  * STRICTLY beats staying (ties keep the current label; among equal
  * winners the SMALLEST label wins via the [[LabelPropagation]]
  * lexicographic struct-max). Everything is BIGINT, so a fixed sweep
  * count unrolls bit-exactly into the DuckDB oracle ([[sqlRefine]]).
  * Overflow bound: |2m·k_{i,c}| needs m·k < 4.6e18 — down-sample
  * degrees far above any corpus graph here.
  *
  * DETERMINISTIC PARALLEL SCHEDULE: classic Louvain is sequential
  * (order-dependent); a synchronous everyone-moves sweep can
  * oscillate two adjacent nodes past each other. Each sweep therefore
  * moves only nodes of one id-PARITY (even sweeps move even ids, odd
  * sweeps odd) — a fixed 2-coloring that keeps most move pairs
  * non-simultaneous and makes the schedule engine-independent. The
  * strict-gain rule + staggering give monotone Q on every fixture and
  * the trade graph (LouvainSpec pins Q ≥ label-prop's and Q ≥ the
  * input labeling's); that MONOTONICITY guarantee is EMPIRICAL, not
  * structural — same-parity adjacent moves can in principle
  * interleave, which a fixed-dataflow (oracle-able) variant cannot
  * fully exclude. The COMMUNITIES-ARE-CONNECTED invariant, by
  * contrast, IS structural when the [[connectivityPass]] /
  * [[leiden]] / [[leidenTwoLevel]] variants are used.
  *
  * Scale shape: per sweep ONE edges⋈labels equi-join (k_{i,c} — the
  * only corpus-sized shuffle), one labels⋈degrees hash agg (d_c,
  * community-axis), one candidate-axis join + struct-argmax, one
  * #nodes-sized label update. Degrees and the mirrored edge list are
  * computed once and localCheckpoint'd; label lineage flattens per
  * sweep. No windows, no collect. */
object Louvain {

  /** Refine `labels(node, label)` over undirected distinct
    * `edges(a, b)` (a ≠ b; dedup'd — the [[Modularity]] input
    * convention) through `sweeps` parity-staggered local-move rounds.
    * Node ids must be non-negative integers (the parity schedule).
    * Returns `(node, label)` for every labeled node. */
  def refine(edges: DataFrame, labels: DataFrame, sweeps: Int): DataFrame =
    refineWeighted(edges.select(col("a"), col("b"), lit(1L).as("w")),
      labels, sweeps)

  /** WEIGHTED local-move refinement — the [[multiLevel]] work-horse:
    * `edges(a, b, w)` undirected with INTEGRAL weights, self-loops
    * (a = b) allowed and carrying the contracted intra-community
    * mass. Standard weighted quantities: k_i counts a self-loop TWICE
    * (both endpoints), m = Σw over distinct edges, k_{i,c} excludes
    * self-loops (after removal i is in no candidate). Same
    * exact-integer scores, same parity schedule, same SQL unroll. */
  def refineWeighted(edges: DataFrame, labels: DataFrame,
                     sweeps: Int): DataFrame =
    refineWeighted(edges, labels, sweeps, SmallGraphMax)

  /** Edge/label-count bound for the adaptive driver path (the
    * [[graft.dedup.MinHashDedup.connectedComponentsConverged]]
    * small-graph precedent): below it, the sweeps run as one driver
    * computation instead of ~4 distributed stages each — pure
    * latency at bench scale (the 25-node trade graph paid 6–9 s for
    * 16 tiny joins). Semantics are IDENTICAL (LouvainSpec pins driver
    * ≡ distributed labels; the four oracle rows stay bit-exact). */
  private val SmallGraphMax = 1L << 16

  /** [[refineWeighted]] with an explicit small-graph bound (pass 0 to
    * force the distributed path). */
  def refineWeighted(edges: DataFrame, labels: DataFrame, sweeps: Int,
                     smallGraphMax: Long): DataFrame = {
    require(sweeps >= 1, "sweeps must be >= 1")
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b"), col("w").cast("bigint").as("w"))
      .localCheckpoint()
    val lab0 = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label")).localCheckpoint()
    if (e.count() <= smallGraphMax && lab0.count() <= smallGraphMax) {
      val spark = edges.sparkSession
      import spark.implicits._
      val edgeSeq = e.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val labSeq = lab0.collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      return refineWeightedDriver(edgeSeq, labSeq, sweeps)
        .toDF("node", "label")
    }
    val nonSelf = e.filter(col("a") =!= col("b"))
    val sym = nonSelf.unionByName(nonSelf.select(col("b").as("a"),
      col("a").as("b"), col("w"))).localCheckpoint()
    // weighted degree: mirrored non-self edges once each side + 2w
    // per self-loop
    val deg = sym.select(col("a").as("node"), col("w"))
      .unionByName(e.filter(col("a") === col("b"))
        .select(col("a").as("node"), (col("w") * 2L).as("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("k")).localCheckpoint()
    val mRow = e.agg(sum(col("w"))).collect()(0)
    require(!mRow.isNullAt(0) && mRow.getLong(0) > 0,
      "louvain over an empty edge set")
    val m = mRow.getLong(0)
    // ENFORCED overflow bound (the Hits/KCore guard convention): the
    // score 2m·k_{i,c} − k_i·(d_c − k_i) has |terms| ≤ 2·m·max(k), so
    // 2·m·max(k) must fit in BIGINT or the JVM silently wraps where
    // DuckDB throws. Fail loudly; down-sample degrees to re-enter.
    val maxK = deg.agg(max(col("k"))).collect()(0).getLong(0)
    require(BigInt(2) * BigInt(m) * BigInt(maxK) <= BigInt(Long.MaxValue),
      s"louvain overflow bound violated: 2*m*max(k) = 2*${m}*${maxK} " +
        "exceeds BIGINT; down-sample edge weights/degrees first")
    var lab = lab0
    for (sweep <- 0 until sweeps) {
      val parity = sweep % 2
      // community degree sums under the current labeling
      val dC = lab.join(deg, "node")
        .groupBy(col("label").as("c")).agg(sum(col("k")).as("dc"))
      // i's edge weight into each neighbor community (self-loops out)
      val kic = sym
        .join(lab.select(col("node").as("dst0"), col("label").as("c")),
          col("b") === col("dst0"))
        .groupBy(col("a").as("node"), col("c"))
        .agg(sum(col("w")).as("kic"))
      // candidates = neighbor communities ∪ own (kic 0 when unlinked)
      val cand = kic
        .unionByName(lab.select(col("node"), col("label").as("c"),
          lit(0L).as("kic")))
        .groupBy(col("node"), col("c")).agg(max(col("kic")).as("kic"))
      val scored = cand
        .join(lab.select(col("node"), col("label").as("cur")), "node")
        .join(deg, "node")
        .join(dC, "c")
        .select(col("node"), col("c"), col("cur"),
          (lit(2L * m) * col("kic") - col("k") *
            (col("dc") - when(col("c") === col("cur"), col("k"))
              .otherwise(lit(0L)))).as("score"))
      // community sizes for the singleton-swap guard below
      val sizes = lab.groupBy(col("label").as("__sc"))
        .agg(count(lit(1)).as("__sn"))
      val best = scored.groupBy(col("node"))
        .agg(max(struct(col("score").as("s"), (-col("c")).as("nl")))
            .as("__m"),
          max(when(col("c") === col("cur"), col("score"))).as("__curs"))
        .select(col("node"), (-col("__m.nl")).as("__best"),
          col("__m.s").as("__bs"), col("__curs"))
      // SINGLETON-SWAP GUARD (Lu/Halappanavar/Kalyanaraman 2015): two
      // mutually-best SINGLETON communities moving simultaneously swap
      // labels forever instead of merging; the asymmetric rule — a
      // singleton may enter another singleton only toward the SMALLER
      // label — lets exactly one side move, so the pair fuses. Moves
      // involving any multi-member community are unrestricted.
      lab = lab.join(best, Seq("node"), "left")
        .join(sizes.select(col("__sc"), col("__sn").as("__curn")),
          col("label") === col("__sc"), "left")
        .join(sizes.select(col("__sc").as("__sc2"),
          col("__sn").as("__bestn")), col("__best") === col("__sc2"), "left")
        .select(col("node"),
          when(Louvain.colorOf(col("node")) === parity &&
              col("__bs") > col("__curs") &&
              !(col("__curn") === 1L && col("__bestn") === 1L &&
                col("__best") > col("label")), col("__best"))
            .otherwise(col("label")).as("label"))
        .localCheckpoint()
    }
    lab
  }

  /** The driver twin of the distributed sweep loop — the SAME
    * dataflow expressed over scala maps, term for term (inner-join
    * semantics included: nodes without a degree entry never move;
    * candidate communities without a d_c entry are not scored; a
    * missing own-community score blocks the move exactly like the
    * null comparison does distributed). Exact Long arithmetic under
    * the same enforced overflow bound. */
  private def refineWeightedDriver(edges: Seq[(Long, Long, Long)],
                                   labels: Seq[(Long, Long)],
                                   sweeps: Int): Seq[(Long, Long)] = {
    val m = edges.iterator.map(_._3).sum
    require(edges.nonEmpty && m > 0, "louvain over an empty edge set")
    val nonSelf = edges.filter(e => e._1 != e._2)
    val sym = nonSelf.flatMap(e =>
      Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    sym.foreach { case (a, _, w) => deg(a) = deg.getOrElse(a, 0L) + w }
    edges.filter(e => e._1 == e._2).foreach { case (a, _, w) =>
      deg(a) = deg.getOrElse(a, 0L) + 2L * w }
    val maxK = if (deg.isEmpty) 0L else deg.values.max
    require(BigInt(2) * BigInt(m) * BigInt(maxK) <= BigInt(Long.MaxValue),
      s"louvain overflow bound violated: 2*m*max(k) = 2*${m}*${maxK} " +
        "exceeds BIGINT; down-sample edge weights/degrees first")
    var lab = labels.toMap
    def colorOfL(node: Long): Long =
      ((node % 1000003L) * 2654435761L % 1000000007L) % 2L
    for (sweep <- 0 until sweeps) {
      val parity = sweep % 2
      val dc = scala.collection.mutable.Map.empty[Long, Long]
      lab.foreach { case (node, l) =>
        deg.get(node).foreach(k => dc(l) = dc.getOrElse(l, 0L) + k) }
      val kic = scala.collection.mutable.Map.empty[(Long, Long), Long]
      sym.foreach { case (a, b, w) =>
        lab.get(b).foreach(c =>
          kic((a, c)) = kic.getOrElse((a, c), 0L) + w) }
      val candsOf = kic.keys.toSeq.groupBy(_._1)
        .map { case (n, ks) => n -> ks.map(_._2).toSet }
      val sizes = lab.values.groupBy(identity).map { case (l, vs) =>
        l -> vs.size.toLong }
      lab = lab.map { case (node, cur) =>
        val newLabel = deg.get(node) match {
          case None => cur // no degree row: never scored, never moves
          case Some(k) =>
            val cands = candsOf.getOrElse(node, Set.empty[Long]) + cur
            // score only candidates with a d_c row (inner join)
            val scored = cands.toSeq.flatMap { c =>
              dc.get(c).map { dcv =>
                val kicV = kic.getOrElse((node, c), 0L)
                val own = if (c == cur) k else 0L
                (c, 2L * m * kicV - k * (dcv - own))
              }
            }
            val cursOpt = scored.find(_._1 == cur).map(_._2)
            if (scored.isEmpty || cursOpt.isEmpty) cur
            else {
              // argmax by (score, then SMALLEST label) — the struct
              // max over (s, -c)
              val (best, bs) = scored.maxBy { case (c, s) => (s, -c) }
              val curs = cursOpt.get
              val singletonSwap = sizes.getOrElse(cur, 0L) == 1L &&
                sizes.getOrElse(best, 0L) == 1L && best > cur
              if (colorOfL(node) == parity && bs > curs && !singletonSwap)
                best
              else cur
            }
        }
        node -> newLabel
      }
    }
    lab.toSeq
  }

  /** Deterministic, engine-portable 2-coloring of node ids for the
    * sweep schedule. Raw `node % 2` degenerates on CONTRACTED graphs
    * (super-node ids are min member ids and often share parity); the
    * bounded multiplicative hash — operands capped so BIGINT never
    * overflows (DuckDB throws where the JVM would wrap) — mixes any
    * id set. */
  private[graph] def colorOf(node: org.apache.spark.sql.Column) =
    ((node % 1000003L) * 2654435761L % 1000000007L) % 2L

  /** SQL twin of [[colorOf]]. */
  private def sqlColorOf(node: String): String =
    s"((($node % 1000003) * 2654435761) % 1000000007) % 2"

  /** FULL (two-phase) LOUVAIN, fixed two levels: local moves on the
    * raw graph, then COARSENING — each community contracts to one
    * super-node, intra-community edges become self-loops carrying
    * their weight — and a second weighted local-move pass over the
    * contracted graph, whose labels map back through the level-1
    * assignment. This is the move one-level refinement cannot make:
    * merging two whole communities at once (a chain of single-node
    * moves through the valley between them never fires under the
    * strict-gain rule). Deterministic end to end, so the whole
    * two-level dataflow unrolls into the DuckDB oracle
    * ([[sqlTwoLevel]]). Returns `(node, label)` — labels are level-2
    * community ids (min super-node id, themselves level-1 labels). */
  def twoLevel(edges: DataFrame, labels: DataFrame,
               sweeps: Int): DataFrame =
    twoLevel(edges, labels, sweeps, SmallGraphMax)

  /** [[twoLevel]] with an explicit small-graph bound (pass 0 to force
    * the distributed path). Below the bound the WHOLE two-level
    * dataflow — level-1 refine, contraction, level-2 weighted refine,
    * label map-back — runs as one driver computation: the distributed
    * shape pays ~8 scheduler round-trips on inter-level frames that
    * are tiny whenever both levels' inputs are (the contracted graph
    * is never larger than the base graph). */
  def twoLevel(edges: DataFrame, labels: DataFrame, sweeps: Int,
               smallGraphMax: Long): DataFrame = {
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    val lab0 = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label")).localCheckpoint()
    if (e.count() <= smallGraphMax && lab0.count() <= smallGraphMax) {
      val spark = edges.sparkSession
      import spark.implicits._
      val edgeSeq = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val labSeq = lab0.collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      return twoLevelDriver(edgeSeq, labSeq, sweeps, connectivity = false)
        .toDF("node", "label")
    }
    val l1 = refineWeighted(e.select(col("a"), col("b"),
      lit(1L).as("w")), lab0, sweeps, smallGraphMax).localCheckpoint()
    val la = l1.select(col("node").as("a"), col("label").as("__la"))
    val lb = l1.select(col("node").as("b"), col("label").as("__lb"))
    val superEdges = e.join(la, "a").join(lb, "b")
      .select(least(col("__la"), col("__lb")).as("a"),
        greatest(col("__la"), col("__lb")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
    val ident = l1.select(col("label").as("node")).distinct()
      .withColumn("label", col("node"))
    val l2 = refineWeighted(superEdges, ident, sweeps, smallGraphMax)
    l1.join(l2.select(col("node").as("__c1"), col("label").as("__c2")),
        col("label") === col("__c1"), "left")
      .select(col("node"),
        coalesce(col("__c2"), col("label")).as("label"))
  }

  /** Driver twin of the two-level composition — the SAME dataflow as
    * the distributed [[twoLevel]]/[[leidenTwoLevel]] bodies, term for
    * term: level-1 refine (+ connectivity split when `connectivity`),
    * contraction via inner label lookups (edges with an unlabeled
    * endpoint drop, as the distributed equi-joins drop them),
    * super-edge weights = base-edge counts per (least, greatest) label
    * pair, identity labeling of the distinct level-1 labels, level-2
    * refine (+ split), and the left-join label map-back. */
  private def twoLevelDriver(edges: Seq[(Long, Long)],
                             labels: Seq[(Long, Long)], sweeps: Int,
                             connectivity: Boolean): Seq[(Long, Long)] = {
    def split(lab: Seq[(Long, Long)],
              es: Seq[(Long, Long)]): Seq[(Long, Long)] =
      if (connectivity) connectivityDriver(es, lab) else lab
    val l1 = split(refineWeightedDriver(
      edges.map(e => (e._1, e._2, 1L)), labels, sweeps), edges)
    val l1Map = l1.toMap
    val superEdges = edges.flatMap { case (a, b) =>
      for (la <- l1Map.get(a); lb <- l1Map.get(b))
        yield (math.min(la, lb), math.max(la, lb))
    }.groupBy(identity).map { case ((a, b), g) =>
      (a, b, g.size.toLong) }.toSeq
    val ident = l1Map.values.toSeq.distinct.map(l => (l, l))
    val l2 = split(refineWeightedDriver(superEdges, ident, sweeps),
      superEdges.map(e => (e._1, e._2))).toMap
    l1.map { case (node, c1) => (node, l2.getOrElse(c1, c1)) }
  }

  /** Driver twin of [[connectivityPass]] over collected seqs — the
    * union-find body shared with the DataFrame entry point. */
  private def connectivityDriver(edges: Seq[(Long, Long)],
                                 labels: Seq[(Long, Long)])
      : Seq[(Long, Long)] = {
    val labMap = labels.toMap
    val intra = edges.filter { case (a, b) => a != b &&
      labMap.get(a).exists(la => labMap.get(b).contains(la)) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent(c); parent(c) = r; c = n
      }
      r
    }
    intra.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
    labMap.keys.foreach { n =>
      val r = find(n)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
    }
    labMap.keys.toSeq.map(n => (n, minOfRoot(find(n))))
  }

  /** LEIDEN CONNECTIVITY POST-PASS (Traag/Waltman/van Eck 2019, the
    * defect their refinement phase exists to fix): plain local-move
    * Louvain can leave a community internally DISCONNECTED — a bridge
    * node moves out and strands the two halves it joined, and no
    * strict-gain single-node move can separate them (each half alone
    * has no better candidate). This pass makes the "communities are
    * internally connected" invariant STRUCTURAL instead of empirical:
    * split every community into the connected components of its
    * intra-community subgraph, relabeling each component to its MIN
    * member id (the [[LabelPropagation]] canonical convention —
    * already-connected min-labeled communities are unchanged).
    *
    * Q is NON-DECREASING by construction: the only pairs a split
    * separates are cross-component pairs with ZERO edge weight
    * between them, whose modularity contribution −k_i·k_j/(2m²) is
    * strictly negative — removing them can only raise Q
    * (LouvainSpec pins it on a stranded-bridge fixture).
    *
    * Scale shape: one edges⋈labels⋈labels equi-join to the
    * intra-community edge list (corpus-sized, hash-partitioned), then
    * [[graft.dedup.MinHashDedup.connectedComponents]] — min-label
    * propagation in O(component diameter) rounds with the adaptive
    * driver union-find for small graphs. No windows, no collect. */
  def connectivityPass(edges: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label")).localCheckpoint()
    val e0 = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    // adaptive small-graph path (the refineWeighted precedent): the
    // intra-edge join + CC collapse to one driver union-find
    if (e0.count() <= SmallGraphMax && lab.count() <= SmallGraphMax) {
      val spark = edges.sparkSession
      import spark.implicits._
      val labMap = lab.collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap
      val intra = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a != b &&
          labMap.get(a).exists(la => labMap.get(b).contains(la)) }
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      intra.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
      labMap.keys.foreach { n =>
        val r = find(n)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
      }
      return labMap.keys.toSeq
        .map(n => (n, minOfRoot(find(n)))).toDF("node", "label")
    }
    val e = e0.filter(col("a") =!= col("b"))
    val intra = e
      .join(lab.select(col("node").as("a"), col("label").as("__la")), "a")
      .join(lab.select(col("node").as("b"), col("label").as("__lb")), "b")
      .filter(col("__la") === col("__lb"))
      .select(col("a"), col("b"))
    val comp = graft.dedup.MinHashDedup.connectedComponents(intra)
    // nodes with no intra-community edge are their own component
    lab.join(comp.select(col("id").as("node"),
        col("component").cast("bigint").as("__comp")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__comp"), col("node")).as("label"))
  }

  /** DuckDB twin of [[connectivityPass]] — exact reachability closure
    * over the intra-community subgraph via a recursive CTE; new label
    * = min reachable id (singletons reach only themselves). */
  def sqlConnectivityPass(edgesSql: String, labelsSql: String): String = s"""
    SELECT node, label FROM (
      WITH RECURSIVE lab AS MATERIALIZED (
        SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
        FROM ($labelsSql)),
      ie AS MATERIALIZED (
        SELECT CAST(e.a AS BIGINT) AS a, CAST(e.b AS BIGINT) AS b
        FROM ($edgesSql) e
        JOIN lab la ON e.a = la.node
        JOIN lab lb ON e.b = lb.node
        WHERE la.label = lb.label AND e.a <> e.b),
      symc AS MATERIALIZED (
        SELECT a, b FROM ie UNION SELECT b AS a, a AS b FROM ie),
      reach(node, r) AS (
        SELECT node, node AS r FROM lab
        UNION
        SELECT s.b AS node, reach.r
        FROM symc s JOIN reach ON s.a = reach.node)
      SELECT node, CAST(min(r) AS BIGINT) AS label
      FROM reach GROUP BY node)"""

  /** [[refine]] + [[connectivityPass]]: one-level Leiden-style local
    * moves whose output communities are PROVABLY internally
    * connected. */
  def leiden(edges: DataFrame, labels: DataFrame, sweeps: Int): DataFrame =
    leiden(edges, labels, sweeps, SmallGraphMax)

  /** [[leiden]] with an explicit small-graph bound (pass 0 to force
    * the distributed path). Below it, refine + connectivity split run
    * as ONE driver computation and one toDF — the separate entry
    * points each re-collected the same tiny frames. */
  def leiden(edges: DataFrame, labels: DataFrame, sweeps: Int,
             smallGraphMax: Long): DataFrame = {
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    val lab0 = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label")).localCheckpoint()
    if (e.count() <= smallGraphMax && lab0.count() <= smallGraphMax) {
      val spark = edges.sparkSession
      import spark.implicits._
      val edgeSeq = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val labSeq = lab0.collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      return connectivityDriver(edgeSeq, refineWeightedDriver(
          edgeSeq.map(x => (x._1, x._2, 1L)), labSeq, sweeps))
        .toDF("node", "label")
    }
    connectivityPass(e, refineWeighted(e.select(col("a"), col("b"),
      lit(1L).as("w")), lab0, sweeps, smallGraphMax))
  }

  /** DuckDB twin of [[leiden]]. */
  def sqlLeiden(edgesSql: String, labelsSql: String, sweeps: Int): String =
    s"""SELECT node, label FROM (${sqlConnectivityPass(edgesSql,
      sqlRefine(edgesSql, labelsSql, sweeps))})"""

  /** TWO-LEVEL LEIDEN — [[twoLevel]] with the connectivity pass after
    * EACH local-move phase, before contraction: level-1 communities
    * are split into connected components, contracted (so every
    * super-node is internally connected by construction), and the
    * level-2 labeling is split again on the contracted graph. A
    * level-2 merge joins whole super-nodes along super-edges, so the
    * final communities are connected in the base graph — the Leiden
    * guarantee, structural end to end. Deterministic; the whole
    * dataflow unrolls into the DuckDB oracle ([[sqlLeidenTwoLevel]]). */
  def leidenTwoLevel(edges: DataFrame, labels: DataFrame,
                     sweeps: Int): DataFrame =
    leidenTwoLevel(edges, labels, sweeps, SmallGraphMax)

  /** [[leidenTwoLevel]] with an explicit small-graph bound (pass 0 to
    * force the distributed path); below it the whole two-level
    * dataflow including both connectivity splits runs driver-side. */
  def leidenTwoLevel(edges: DataFrame, labels: DataFrame, sweeps: Int,
                     smallGraphMax: Long): DataFrame = {
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    val lab0 = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label")).localCheckpoint()
    if (e.count() <= smallGraphMax && lab0.count() <= smallGraphMax) {
      val spark = edges.sparkSession
      import spark.implicits._
      val edgeSeq = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val labSeq = lab0.collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      return twoLevelDriver(edgeSeq, labSeq, sweeps, connectivity = true)
        .toDF("node", "label")
    }
    val l1 = connectivityPass(e, refineWeighted(e.select(col("a"),
      col("b"), lit(1L).as("w")), lab0, sweeps, smallGraphMax))
      .localCheckpoint()
    val la = l1.select(col("node").as("a"), col("label").as("__la"))
    val lb = l1.select(col("node").as("b"), col("label").as("__lb"))
    val superEdges = e.join(la, "a").join(lb, "b")
      .select(least(col("__la"), col("__lb")).as("a"),
        greatest(col("__la"), col("__lb")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val ident = l1.select(col("label").as("node")).distinct()
      .withColumn("label", col("node"))
    val l2 = connectivityPass(superEdges.select(col("a"), col("b")),
      refineWeighted(superEdges, ident, sweeps, smallGraphMax))
    l1.join(l2.select(col("node").as("__c1"), col("label").as("__c2")),
        col("label") === col("__c1"), "left")
      .select(col("node"),
        coalesce(col("__c2"), col("label")).as("label"))
  }

  /** DuckDB twin of [[leidenTwoLevel]]. */
  def sqlLeidenTwoLevel(edgesSql: String, labelsSql: String,
                        sweeps: Int): String = s"""
    WITH eb AS MATERIALIZED ($edgesSql),
    lv1 AS MATERIALIZED (${sqlConnectivityPass("SELECT a, b FROM eb",
      sqlRefine("SELECT a, b FROM eb", labelsSql, sweeps))}),
    se AS MATERIALIZED (
      SELECT least(la.label, lb.label) AS a,
        greatest(la.label, lb.label) AS b,
        CAST(count(*) AS BIGINT) AS w
      FROM eb JOIN lv1 la ON eb.a = la.node
      JOIN lv1 lb ON eb.b = lb.node
      GROUP BY 1, 2),
    ident AS (SELECT DISTINCT label AS node, label FROM lv1),
    lv2 AS MATERIALIZED (${sqlConnectivityPass("SELECT a, b FROM se",
      sqlRefineWeighted("SELECT a, b, w FROM se",
        "SELECT node, label FROM ident", sweeps))})
    SELECT lv1.node, CAST(coalesce(lv2.label, lv1.label) AS BIGINT) AS label
    FROM lv1 LEFT JOIN lv2 ON lv1.label = lv2.node"""

  /** DuckDB twin of [[twoLevel]] — level-1 unrolled refine,
    * contraction groupBy, level-2 weighted refine, label composition. */
  def sqlTwoLevel(edgesSql: String, labelsSql: String,
                  sweeps: Int): String = s"""
    WITH eb AS MATERIALIZED ($edgesSql),
    lv1 AS MATERIALIZED (${sqlRefine("SELECT a, b FROM eb", labelsSql,
      sweeps)}),
    se AS MATERIALIZED (
      SELECT least(la.label, lb.label) AS a,
        greatest(la.label, lb.label) AS b,
        CAST(count(*) AS BIGINT) AS w
      FROM eb JOIN lv1 la ON eb.a = la.node
      JOIN lv1 lb ON eb.b = lb.node
      GROUP BY 1, 2),
    ident AS (SELECT DISTINCT label AS node, label FROM lv1),
    lv2 AS MATERIALIZED (${sqlRefineWeighted("SELECT a, b, w FROM se",
      "SELECT node, label FROM ident", sweeps)})
    SELECT lv1.node, CAST(coalesce(lv2.label, lv1.label) AS BIGINT) AS label
    FROM lv1 LEFT JOIN lv2 ON lv1.label = lv2.node"""

  /** DuckDB twin of [[refine]] — delegates to the weighted form with
    * unit weights (sum-of-ones ≡ the original counts, exactly). */
  def sqlRefine(edgesSql: String, labelsSql: String, sweeps: Int): String =
    sqlRefineWeighted(
      s"SELECT a, b, CAST(1 AS BIGINT) AS w FROM ($edgesSql)",
      labelsSql, sweeps)

  /** DuckDB twin of [[refineWeighted]] — the fixed sweeps unrolled as
    * CTEs, identical candidate/score/argmax arithmetic. `edgesSql`
    * must select undirected `(a, b, w)` (self-loops allowed);
    * `labelsSql` → `(node, label)` BIGINTs. */
  def sqlRefineWeighted(edgesSql: String, labelsSql: String,
                        sweeps: Int): String = {
    require(sweeps >= 1)
    val head = s"""
      WITH e AS MATERIALIZED ($edgesSql),
      sym AS MATERIALIZED (SELECT a, b, w FROM e WHERE a <> b
             UNION ALL SELECT b AS a, a AS b, w FROM e WHERE a <> b),
      deg AS MATERIALIZED (SELECT node, CAST(sum(w) AS BIGINT) AS k FROM (
               SELECT a AS node, w FROM sym
               UNION ALL SELECT a AS node, w * 2 AS w FROM e WHERE a = b)
             GROUP BY node),
      mm AS MATERIALIZED (SELECT CAST(sum(w) AS BIGINT) AS m FROM e),
      l0 AS MATERIALIZED (SELECT CAST(node AS BIGINT) AS node,
                    CAST(label AS BIGINT) AS label FROM ($labelsSql))"""
    val iters = (0 until sweeps).map { i =>
      val p = i % 2
      val j = i + 1
      s"""
      dc$j AS MATERIALIZED (SELECT l.label AS c, CAST(sum(d.k) AS BIGINT) AS dc
               FROM l$i l JOIN deg d ON l.node = d.node GROUP BY 1),
      kic$j AS MATERIALIZED (SELECT s.a AS node, lb.label AS c,
                  CAST(sum(s.w) AS BIGINT) AS kic
                FROM sym s JOIN l$i lb ON s.b = lb.node GROUP BY 1, 2),
      cand$j AS MATERIALIZED (SELECT node, c, CAST(max(kic) AS BIGINT) AS kic FROM (
                   SELECT node, c, kic FROM kic$j
                   UNION ALL
                   SELECT node, label AS c, CAST(0 AS BIGINT) FROM l$i)
                 GROUP BY node, c),
      sc$j AS MATERIALIZED (SELECT cd.node, cd.c, cur.label AS cur,
                 2 * mm.m * cd.kic - d.k * (dc$j.dc -
                   CASE WHEN cd.c = cur.label THEN d.k ELSE 0 END) AS score
               FROM cand$j cd
               JOIN l$i cur ON cd.node = cur.node
               JOIN deg d ON cd.node = d.node
               JOIN dc$j ON cd.c = dc$j.c
               CROSS JOIN mm),
      sz$j AS MATERIALIZED (SELECT label AS szc,
                CAST(count(*) AS BIGINT) AS szn
              FROM l$i GROUP BY label),
      b$j AS MATERIALIZED (SELECT node, max({'s': score, 'nl': -c}) AS mb,
                max(CASE WHEN c = cur THEN score END) AS curs
              FROM sc$j GROUP BY node),
      l$j AS MATERIALIZED (SELECT cur.node,
                CAST(CASE WHEN ${sqlColorOf("cur.node")} = $p
                            AND (b$j.mb).s > b$j.curs
                            AND NOT (szc.szn = 1 AND szb.szn = 1
                              AND -(b$j.mb).nl > cur.label)
                     THEN -(b$j.mb).nl ELSE cur.label END AS BIGINT) AS label
              FROM l$i cur LEFT JOIN b$j ON cur.node = b$j.node
              LEFT JOIN sz$j szc ON cur.label = szc.szc
              LEFT JOIN sz$j szb ON -(b$j.mb).nl = szb.szc)"""
    }.mkString(",")
    s"$head,$iters SELECT node, label FROM l$sweeps"
  }
}
