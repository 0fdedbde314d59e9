package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames.
  *
  * Complements the connected-components labeling in [[Dedup]] with
  * weighted PageRank — the influence/centrality measure a link-graph
  * or citation-graph curation pass ranks by (e.g. page importance as
  * a crawl-corpus quality prior). The reference has no graph layer;
  * this is part of the training-data-pipeline extension surface
  * (SURVEY §2 D-rows).
  *
  * Everything is deterministic FIXED-POINT integer math: ranks are
  * ×10⁹ longs, per-edge contributions and the damping blend use only
  * long multiply / truncating divide, so two engines that follow the
  * same recurrence produce BIT-IDENTICAL rank tables — a double
  * formulation would drift on summation order across partitions and
  * could never hash-match a SQL oracle.
  *
  * Scale shape (100 TB graph): edges are hash-partitioned on `src`
  * for the rank join and on `dst` for the contribution aggregation —
  * the two exchanges a distributed PageRank fundamentally needs per
  * iteration; the rank table itself is node-sized, never
  * edge-sized. Every second iteration ends in an executor-local
  * `localCheckpoint` (the [[Dedup.connectedComponentsWithRounds]]
  * pattern) so lineage stays O(1)-deep across iterations instead of
  * growing an iters-deep self-referencing plan, while paying half
  * the materialization barriers.
  */
object Graph {

  /** Rank fixed-point scale: 1.0 == 1e9. */
  val RankFx: Long = 1000000000L

  /** Weighted PageRank with damping `dampNum/dampDen` (default
    * 0.85) for a fixed `iters` iterations.
    *
    * Recurrence (all integer ops, `div` = truncating division):
    * {{{
    *   out_w(u)   = Σ w(u→·)
    *   c_fx(e)    = (r_fx(u) * w(e)) div out_w(u)        per edge e: u→v
    *   dang_fx    = Σ r_fx(u) over u with no out-edges
    *   r'_fx(v)   = ((RankFx*(dampDen-dampNum)) div dampDen) div n
    *              + (dampNum * (sum_fx(v) + dang_fx div n)) div dampDen
    * }}}
    *
    * Contract: weights must be positive longs with
    * `max(r_fx) * max(w) < 2^63` — i.e. per-source total weight
    * below ~9·10⁹ at the default scale. Edge weights that are
    * counts satisfy this at any realistic fan-out.
    *
    * Returns (node, r_fx) — exact longs; callers divide by
    * [[RankFx]] for the real-valued rank.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int = 5,
      dampNum: Long = 85L,
      dampDen: Long = 100L
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    val eRaw = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .localCheckpoint(true)
    // Loop-INVARIANT state is attached/partitioned once, outside the
    // iteration (r13 optimization pass, guide §2.4):
    //  - out_w rides ON the edge row, so the per-iteration plan loses
    //    its outW join (it re-joined an identical aggregate every
    //    round);
    //  - the joined edge table is checkpointed HASH-PARTITIONED ON
    //    `src`, so each iteration's rank join exchanges only the
    //    node-sized rank table — the edge-sized exchange per round is
    //    gone (2 edge shuffles/iter -> 1 node shuffle + the
    //    fundamental dst aggregation);
    //  - danglingness is static: it becomes a flag on the rank row,
    //    replacing the per-iteration anti-join (two exchanges) with a
    //    filter+aggregate over the node-sized rank table.
    val outW = eRaw.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val e = eRaw.join(outW, "src")
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = eRaw.select(col("src").as("node"), lit(1L).as("o"))
      .union(eRaw.select(col("dst").as("node"), lit(0L).as("o")))
      .groupBy(col("node")).agg(max(col("o")).as("has_out"))
      .select(col("node"), (col("has_out") === 0L).as("dangling"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val basePart = ((RankFx * (dampDen - dampNum)) / dampDen) / n

    var ranks = nodes.select(col("node"), col("dangling"), lit(RankFx / n).as("r_fx"))
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.select(col("node").as("src"), col("r_fx")),
          "src")
        .select(col("dst").as("node"),
          expr("(r_fx * w) div out_w").as("c_fx"))
      val sums = contribs.groupBy(col("node")).agg(sum(col("c_fx")).as("sum_fx"))
      // Dangling mass: a 1-row aggregate over the flagged rank rows,
      // broadcast back in-plan — no per-iteration driver round-trip,
      // no per-iteration anti-join.
      val dang = ranks.filter(col("dangling"))
        .agg(coalesce(sum(col("r_fx")), lit(0L)).as("dang_fx"))
      ranks = nodes
        .join(sums, Seq("node"), "left")
        .na.fill(0L, Seq("sum_fx"))
        .crossJoin(broadcast(dang))
        .select(col("node"), col("dangling"),
          (lit(basePart) +
            expr(s"($dampNum * (sum_fx + dang_fx div ${n}L)) div $dampDen"))
            .as("r_fx"))
      // Truncate lineage every other iteration: a 2-iteration plan
      // is still O(1)-deep, and halving the eager materialization
      // barriers measurably cuts the fixed per-job cost that
      // dominates small graphs.
      if (i % 2 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("r_fx"))
  }

  /** Weighted eigenvector centrality by max-normalized power
    * iteration, for a fixed `iters` iterations — the "influence of
    * your in-neighbors, not just their count" centrality beside
    * [[pageRank]] (no damping, no dangling redistribution: mass
    * flows strictly along in-edges and the max-normalization keeps
    * the vector bounded where PageRank's stochastic blend does).
    *
    * Recurrence (all integer ops, `div` truncating — bit-identical
    * on any engine replaying it):
    * {{{
    *   r0(v)    = RankFx
    *   s(v)     = Σ over e: u→v of r(u) * w(e)
    *   d        = max_v s(v) div RankFx + 1
    *   r'(v)    = s(v) div d                    (≤ ~RankFx)
    * }}}
    * Overflow contract: `RankFx * max_in_weight(v) * 1` per term and
    * node-sums below 2^63 — per-node in-weight under ~9·10⁹, the
    * same class of bound as [[pageRank]]'s.
    *
    * Scale shape: identical to PageRank's — the rank join on `src`
    * and the contribution agg on `dst` are the two fundamental
    * exchanges; the normalizer is a 1-row aggregate broadcast back
    * in-plan (never a driver round-trip); lineage truncated every
    * second iteration.
    */
  def eigenCentrality(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int = 4
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // (r13 note: an edge table checkpointed hash-partitioned on `src`
    // was measured here and REJECTED — the per-iteration rank table
    // broadcasts below the 10 MB threshold, so no edge exchange
    // exists to remove and the extra build exchange was pure cost;
    // the layout only pays once ranks outgrow broadcast range.)
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(RankFx).as("r_fx"))
    for (i <- 1 to iters) {
      val sums = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r_fx * w").as("c_fx"))
        .groupBy(col("node")).agg(sum(col("c_fx")).as("s_fx"))
      val norm = sums.agg(expr(s"max(s_fx) div ${RankFx}L + 1L").as("d"))
      ranks = nodes
        .join(sums, Seq("node"), "left")
        .na.fill(0L, Seq("s_fx"))
        .crossJoin(broadcast(norm))
        .select(col("node"), expr("s_fx div d").as("r_fx"))
      if (i % 2 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Per-node triangle counts over an undirected graph, with
    * degree-ordered edge orientation — the standard trick that makes
    * distributed triangle enumeration skew-safe: every edge is
    * oriented from its lower-(degree, id) endpoint to the higher
    * one, so wedge fan-out at a hub of degree d collapses from
    * O(d²) to O(Σ over its LOWER-ranked neighbors) and total work is
    * bounded by O(m^{3/2}) regardless of the degree distribution
    * (a raw id-ordered enumeration on a star-heavy graph would put
    * the whole wedge blowup on the hub's partition).
    *
    * Each triangle is enumerated exactly once (its unique
    * rank-increasing orientation), so the per-node counts are
    * IDENTICAL to the naive a&lt;b&lt;c id-ordered definition an
    * oracle can state in SQL — the spec pins that equivalence.
    *
    * Input: one row per undirected edge (either endpoint order,
    * duplicates tolerated — normalized and distinct'd here).
    * Returns (node, tri_cnt) for nodes in ≥1 triangle.
    *
    * Scale shape: degrees are a node-sized aggregation; the wedge
    * join and the closing edge join are hash joins on node / edge
    * keys — three shuffles total, never a cartesian; nothing is
    * collected to the driver.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient low-(degree, id) -> high-(degree, id).
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"))
    val e = oriented.localCheckpoint(true)
    // Wedges a->b, a->c from the shared lower-ranked apex a (the
    // b/c legs id-ordered so each unordered pair appears once),
    // closed by the edge between b and c looked up through its
    // id-CANONICAL form — an equi-join; the wedge doesn't know the
    // b/c pair's rank order and an OR-of-orientations condition
    // would not hash-join.
    val wedges = e.as("e1")
      .join(e.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val canon = e.select(
      least(col("a"), col("b")).as("p"),
      greatest(col("a"), col("b")).as("q"))
    val tri = wedges
      .join(canon, col("y") === col("p") && col("z") === col("q"))
      .select(col("x"), col("y"), col("z"))
    tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("tri_cnt"))
  }

  /** Minimum-hop BFS distances from a seed set over an undirected
    * edge list, bounded to `maxHops` expansion rounds — the
    * TRAVERSAL/distance capability beside CC (reachability), PageRank
    * (importance), LPA (communities), and triangles (cohesion): "what
    * is within k hops of these nodes" is the neighborhood-expansion
    * query a link-graph curation pass uses to grow a trusted seed set
    * (and the building block of k-hop feature extraction).
    *
    * Returns (node, dist) for every node reachable in ≤ maxHops hops,
    * dist = exact minimum hop count (longs — no floats anywhere, so
    * the result is bit-identical under any partitioning).
    *
    * Scale shape: per round, ONE hash join of the edge table to the
    * frontier (node-sized), a distinct on the discovered neighbors,
    * and a left-anti join against the visited set — all equi-joins on
    * node keys, never edge×edge; the visited table is node-bounded
    * and checkpointed per round so lineage stays O(1)-deep (the
    * [[pageRank]] pattern). Work per round is O(edges incident to the
    * frontier), the minimum any distributed BFS pays. The frontier is
    * re-read from the CHECKPOINTED visited table (dist = round) so no
    * round recomputes its predecessor's expansion.
    */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val und = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .localCheckpoint(true)
    var visited = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (h <- 1 to maxHops) {
      val frontier = visited
        .filter(col("dist") === lit(h - 1.toLong))
        .select(col("node").as("u"))
      val next = und
        .join(frontier, Seq("u"))
        .select(col("v").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(h.toLong).as("dist"))
      visited = visited.union(next).localCheckpoint(true)
    }
    visited
  }

  /** Bounded Bellman-Ford: minimum total edge cost from a seed set
    * over an undirected weighted edge list, over paths of at most
    * `maxHops` edges — the WEIGHTED companion of [[bfsHops]] (hop
    * count answers "how close"; this answers "how cheap", the
    * tie-strength-aware expansion a curation pass uses when edges
    * carry affinity weights). Costs must be non-negative; with
    * integer costs the result is exact longs, so it is bit-identical
    * under any partitioning.
    *
    * Returns (node, cost) for every node reachable in ≤ maxHops
    * edges, cost = minimum total cost over all such paths (the
    * classic dist_r = min-cost-over-≤r-edge-paths Bellman-Ford
    * invariant).
    *
    * Scale shape: per round, ONE hash join of the edge table to the
    * current dist table (node-sized) and one min-combine groupBy —
    * both node-keyed equi-operations with map-side partial min,
    * never edge×edge; dist is checkpointed per round so lineage
    * stays O(1)-deep. Work per round is O(edges incident to reached
    * nodes) — the standard distributed Bellman-Ford round cost.
    * Callers own edge dedup (each undirected edge once in `edges`).
    */
  def ssspBounded(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      costCol: String,
      seeds: DataFrame,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val und = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(costCol).cast("long").as("w_cost"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v"),
        col(costCol).cast("long").as("w_cost")))
      .localCheckpoint(true)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("cost"))
      .localCheckpoint(true)
    for (_ <- 1 to maxHops) {
      val relax = und
        .join(dist.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node"), (col("cost") + col("w_cost")).as("cost"))
      dist = dist.union(relax)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .localCheckpoint(true)
    }
    dist
  }

  /** One k-core peel round: drop every node whose degree in the
    * current undirected edge list is < k, and every edge touching
    * one. Exposed so a fixed-round registry query and the
    * [[kCore]] fixpoint share the same round body.
    */
  private[graft] def peelOnce(und: DataFrame, k: Int): DataFrame = {
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select(col("u"))
    und.join(deg, Seq("u"))
      .join(deg.withColumnRenamed("u", "v"), Seq("v"))
      .select(col("u"), col("v"))
  }

  /** k-core: the maximal subgraph in which every node has degree
    * ≥ k, by iterated peeling to the fixpoint — the graph-curation
    * densest-region filter (a link-graph trust pass keeps the
    * 2-core to shed pendant chains; community mining starts from
    * higher cores). Input: undirected edge list with EACH edge in
    * BOTH directions (u,v) and (v,u) — the symmetric convention the
    * peel's single-sided degree count relies on.
    *
    * Scale shape: each round is one node-keyed degree agg (map-side
    * combined) + two semi-join-shaped edge filters — O(edges) per
    * round, never edge×edge; the edge set shrinks monotonically and
    * is checkpointed per round (O(1) lineage). Rounds are bounded by
    * the degeneracy ordering depth (≤ node count, tiny in practice);
    * the driver-side loop reads ONE count per round (the [[pageRank]]
    * / CC convergence-probe pattern, not a data collect).
    */
  def kCore(und: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var cur = und.select(col("u"), col("v")).localCheckpoint(true)
    var n = cur.count()
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      val next = peelOnce(cur, k).localCheckpoint(true)
      val m = next.count()
      stable = m == n
      cur = next
      n = m
      round += 1
    }
    cur
  }

  /** Synchronous label propagation (LPA community detection) for a
    * fixed number of iterations over an undirected edge list: every
    * node starts labeled with its own id; each iteration it adopts
    * the most frequent label among its NEIGHBORS, ties broken by the
    * smallest label. Fully deterministic (unlike classic
    * asynchronous LPA, whose result depends on visit order) — which
    * is what makes it SQL-oracle-able and reproducible across runs.
    *
    * Distinct from [[Dedup]]'s connected components: CC converges to
    * one label per component regardless of density; LPA's frequency
    * vote finds DENSE regions inside a component (communities), the
    * curation signal for domain clusters in a link graph.
    *
    * Scale shape: per iteration, one hash join of edges to the
    * node-sized label table (on the neighbor key) and two map-side-
    * combined aggregates — the vote count on (node, label) and the
    * argmax via `min_by` over a (−count, label) struct (constant
    * state per node, no per-node sort). Labels are checkpointed each
    * iteration so lineage stays O(1)-deep. Total work per iteration
    * is O(edges), the minimum any distributed LPA pays.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3
  ): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val und = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .localCheckpoint(true)
    // No checkpoint on the seed labels: they're read once (by the
    // first vote round) and derive from the already-checkpointed
    // edge table — an eager barrier here is a pure extra job.
    var labels = und.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (it <- 1 to iters) {
      val votes = und
        .join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .groupBy(col("u").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("node"))
        .agg(min_by(col("lbl"),
          struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
      // Truncate lineage every SECOND round (the pageRank cadence):
      // each label table is consumed exactly once, so per-round eager
      // checkpoints buy nothing but a materialization barrier each.
      // Dropping the seed checkpoint + halving the round checkpoints
      // measured 5.6 -> 2.7 s at sf0.1; plan depth stays O(1) across
      // iterations.
      if (it % 2 == 0 && it < iters) labels = labels.localCheckpoint(true)
    }
    labels
  }
}
