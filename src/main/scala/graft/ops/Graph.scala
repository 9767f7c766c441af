package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.functions.exact_sum

/** Link-graph centrality for web-corpus curation.
  *
  * Crawl pipelines weight documents by the authority of their host: a
  * PageRank-style score over the domain link graph separates organic sites
  * from SEO farms, and feeds quality mixing the same way CCNet-style
  * pipelines feed perplexity. The graph here is edges-as-data — (src, dst)
  * rows at any granularity (domain, host, page) — and the computation is a
  * fixed-iteration power method expressed as joins + aggregations, so
  * Catalyst plans every step and AQE handles skewed hubs.
  *
  * Determinism: every floating-point reduction (contribution fan-in and
  * dangling mass) runs through [[graft.core.ExactSum]], so ranks are a
  * function of the edge MULTISET alone — bit-identical across
  * partitionings, retries, and cluster sizes, the property that makes a
  * quality-weighting stage reproducible end to end.
  *
  * Scale: rank state is O(nodes) — for a web corpus, domains ≪ pages — and
  * each iteration shuffles contributions keyed by destination node with
  * map-side partial aggregation (the exact_sum buffer is ~KB per group).
  * The degree-annotated edge table is localCheckpoint'd once and re-read
  * per iteration; per-iteration rank state is checkpointed and the previous
  * round's blocks are freed eagerly ([[CheckpointUtil.freeCheckpoint]]), so
  * storage stays bounded at two rank tables regardless of iteration count.
  */
object Graph {

  /** Power-iteration PageRank over an edge list.
    *
    * Semantics (uniform teleport, dangling mass redistributed uniformly —
    * the standard formulation):
    *
    *   rank0(v)   = 1/n
    *   rank_t+1(v) = (1−d)/n + d·( Σ_{(u,v)∈E} rank_t(u)/outdeg(u)
    *                               + Σ_{u dangling} rank_t(u)/n )
    *
    * Parallel edges carry proportional weight (an edge listed twice
    * contributes twice its 1/outdeg share); callers wanting simple-graph
    * semantics `.distinct()` first. Self-loops are honored. Node ids may be
    * any equatable type (strings at domain granularity).
    *
    * @param edges      (src, dst) rows; null endpoints are dropped
    * @param srcCol     source-node column name in `edges`
    * @param dstCol     destination-node column name in `edges`
    * @param iterations maximum iteration count
    * @param damping    d in the update above
    * @param tol        optional early exit: stop once the L1 rank delta
    *                   Σ|rank_t+1 − rank_t| drops below `tol`. The delta
    *                   is one node-sized join of two already-materialized
    *                   checkpoints fanned into `exact_sum`, so the scalar
    *                   the driver reads — and therefore the stop decision
    *                   and the output — is bit-deterministic under any
    *                   partitioning. 0.0 (default) disables the test and
    *                   runs exactly `iterations` rounds with no extra
    *                   per-round job.
    * @return           one row per node: (node, rank); ranks sum to 1
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, damping: Double = 0.85,
      nodeOut: String = "node", rankOut: String = "rank",
      tol: Double = 0.0): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damping >= 0.0 && damping <= 1.0, "damping must be in [0,1]")
    require(tol >= 0.0, "tol must be >= 0")

    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
    // Pin the edge set once: every iteration re-reads these blocks instead
    // of re-running the upstream plan (which may itself contain shuffles).
    val e = e0.localCheckpoint(true)

    val nodes = e.select(col("__src").as("__node"))
      .union(e.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) {
      CheckpointUtil.freeCheckpoint(e)
      CheckpointUtil.freeCheckpoint(nodes)
      return edges.select(col(srcCol).as(nodeOut), lit(0.0).as(rankOut))
        .limit(0)
    }

    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    // (node, deg) with deg null for dangling nodes; shuffled once, reused
    // every iteration via the checkpoint.
    val nodeDeg = nodes.join(outdeg, nodes("__node") === outdeg("__src"), "left")
      .select(col("__node"), col("__deg"))
      .localCheckpoint(true)
    CheckpointUtil.freeCheckpoint(nodes)

    // Every iteration MUST cut lineage (the per-round localCheckpoint
    // below): the update references the previous rank frame twice — once
    // for per-node contributions and once for the dangling-mass scalar —
    // so an uncheckpointed chain doubles both plan size and recomputation
    // work per round (2^k after k uncut rounds; measured as a hang at 12
    // rounds on sf0.001). Per-iteration materialization of the node-sized
    // rank table is the structurally required cost, not an amortizable one.
    var ranks = nodeDeg.select(col("__node"),
      lit(1.0 / n).as("__rank")).localCheckpoint(true)
    var prev: DataFrame = null

    var it = 0
    while (it < iterations) {
      val r = ranks
      // (node, rank/outdeg | null-if-dangling): node-sized, built once per
      // iteration, probed by the edge scan below.
      val rd = r.join(nodeDeg, Seq("__node"))
        .select(col("__node"), col("__rank"),
          (col("__rank") / col("__deg")).as("__share"))
      // Dangling mass: one-row frame, broadcast into the update. exact_sum
      // keeps the scalar partitioning-independent.
      val dangling = rd.where(col("__share").isNull)
        .agg(coalesce(exact_sum(col("__rank")), lit(0.0)).as("__dm"))
      // Contributions keyed by destination; exact_sum's merge is
      // order-independent, so the shuffle needs no ordering.
      val contrib = e.join(rd.where(col("__share").isNotNull),
          e("__src") === rd("__node"))
        .select(e("__dst").as("__node"), col("__share").as("__c"))
        .groupBy("__node")
        .agg(exact_sum(col("__c")).as("__contrib"))
      val next = nodeDeg.select(col("__node"))
        .join(contrib, Seq("__node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("__node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + col("__dm") / n))
            .as("__rank"))
        .localCheckpoint(true)
      // The new checkpoint is materialized; the grandparent's blocks are
      // no longer reachable by any future iteration.
      if (prev != null) CheckpointUtil.freeCheckpoint(prev)
      prev = r
      ranks = next
      it += 1
      if (tol > 0.0 && it < iterations) {
        val delta = next.as("__nw").join(r.as("__pv"),
            col("__nw.__node") === col("__pv.__node"))
          .agg(coalesce(exact_sum(
            abs(col("__nw.__rank") - col("__pv.__rank"))), lit(0.0)))
          .collect()(0).getDouble(0)
        if (delta < tol) it = iterations
      }
    }

    // The result checkpoint is materialized; everything else this loop
    // pinned — the edge table, the degree table, and the second-to-last
    // rank round — can be freed now rather than waiting for driver GC.
    CheckpointUtil.freeCheckpoint(e)
    CheckpointUtil.freeCheckpoint(nodeDeg)
    if (prev != null) CheckpointUtil.freeCheckpoint(prev)
    ranks.select(col("__node").as(nodeOut), col("__rank").as(rankOut))
  }

  /** In/out degree per node — the cheap structural signal (hub/authority
    * counts) pipelines use before paying for PageRank. One pass over the
    * edge list; nodes appearing only as src (or only as dst) get 0 for the
    * missing side. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String,
      nodeOut: String = "node"): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
    val out = e.groupBy(col("__src").as(nodeOut))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("__dst").as(nodeOut))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq(nodeOut), "full")
      .select(col(nodeOut),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /** HITS hubs & authorities (Kleinberg) over an edge list — the
    * complement of [[pageRank]] for crawl curation: authority separates
    * cited content sites from the link-farm hubs that cite them, and hub
    * scores identify directory/aggregator pages whose OUTLINKS are worth
    * crawling next.
    *
    * Update (mutual recursion, L1-normalized each half-step so scores are
    * comparable across graphs and iterations — sums are exact, so the
    * choice of norm does not cost determinism):
    *
    *   auth_t+1(v) ∝ Σ_{(u,v)∈E} hub_t(u)
    *   hub_t+1(u)  ∝ Σ_{(u,v)∈E} auth_t+1(v)
    *
    * Parallel edges contribute once per occurrence (weighted-graph
    * semantics, as in [[pageRank]]); `.distinct()` first for simple-graph
    * semantics. Nodes with no in-edges get authority 0; no out-edges →
    * hub 0. An edgeless graph returns all zeros rather than NaN.
    *
    * Determinism and scale mirror [[pageRank]]: score state is O(nodes);
    * each half-step is one shuffle keyed by the receiving endpoint with
    * map-side exact_sum partials; the normalization scalar is a one-row
    * broadcast; per-round localCheckpoint cuts the doubling lineage
    * (the hub update references the fresh authority frame, which
    * references the previous hub frame) and the previous round's blocks
    * are freed eagerly — storage bounded at two score tables.
    *
    * @return one row per node: (node, hub, authority); each column sums
    *         to 1 (or is all-zero for a side with no edges)
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, nodeOut: String = "node",
      hubOut: String = "hub", authOut: String = "authority"): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")

    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
    val e = e0.localCheckpoint(true)

    val nodes = e.select(col("__src").as("__node"))
      .union(e.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) {
      CheckpointUtil.freeCheckpoint(e)
      CheckpointUtil.freeCheckpoint(nodes)
      return edges.select(col(srcCol).as(nodeOut), lit(0.0).as(hubOut),
        lit(0.0).as(authOut)).limit(0)
    }

    // L1-normalize a non-negative (node, __raw) frame against the full
    // node set; all-zero stays all-zero instead of dividing by zero.
    def spread(raw: DataFrame, outCol: String): DataFrame = {
      val total = raw.agg(
        coalesce(exact_sum(col("__raw")), lit(0.0)).as("__tot"))
      nodes.join(raw, Seq("__node"), "left")
        .crossJoin(broadcast(total))
        .select(col("__node"),
          when(col("__tot") > 0.0,
            coalesce(col("__raw"), lit(0.0)) / col("__tot"))
            .otherwise(lit(0.0)).as(outCol))
    }

    var state = nodes.select(col("__node"),
      lit(1.0).as("__hub"), lit(1.0).as("__auth")).localCheckpoint(true)
    var it = 0
    while (it < iterations) {
      val prev = state
      // auth is referenced twice below (hub update + state join):
      // materialize the node-sized frame once instead of re-running its
      // aggregation, and cut the lineage into prev while at it.
      val auth = spread(
        e.join(prev, e("__src") === prev("__node"))
          .groupBy(e("__dst").as("__node"))
          .agg(exact_sum(col("__hub")).as("__raw")), "__auth")
        .localCheckpoint(true)
      val hub = spread(
        e.join(auth, e("__dst") === auth("__node"))
          .groupBy(e("__src").as("__node"))
          .agg(exact_sum(col("__auth")).as("__raw")), "__hub")
      state = hub.join(auth, Seq("__node"))
        .select(col("__node"), col("__hub"), col("__auth"))
        .localCheckpoint(true)
      CheckpointUtil.freeCheckpoint(prev)
      CheckpointUtil.freeCheckpoint(auth)
      it += 1
    }
    CheckpointUtil.freeCheckpoint(e)
    CheckpointUtil.freeCheckpoint(nodes)
    state.select(col("__node").as(nodeOut), col("__hub").as(hubOut),
      col("__auth").as(authOut))
  }

  /** Common-neighbor link prediction over an (undirected-ized, simple)
    * edge list — the classic triadic-closure scores (Liben-Nowell &
    * Kleinberg 2003): for every NON-adjacent pair (a, b) sharing at
    * least `minCommonNeighbors` neighbors,
    *
    *   cn      = |Γ(a) ∩ Γ(b)|
    *   aa      = Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln deg(z)   (Adamic–Adar)
    *   jaccard = cn / (deg(a) + deg(b) − cn)
    *
    * In a corpus pipeline this is mirror/syndication discovery on the
    * domain graph (two sites never linking each other but sharing many
    * link partners are the same operation) and related-document
    * suggestion on citation graphs.
    *
    * Scale shape: edges collapse to a DISTINCT undirected adjacency
    * (one shuffle); the wedge self-join is keyed by the MIDDLE node, so
    * output is Σ_z C(deg z, 2) — quadratic in hub degree, which is why
    * hubs above `maxDegree` are excluded from the middle role (the
    * df²-guard convention of winnowPairs' maxDocFreq): a 10⁶-degree hub
    * contributes 5·10¹¹ wedges and ~0 Adamic–Adar weight
    * (1/ln 10⁶ ≈ 0.07) — the drop is content-deterministic and changes
    * cn/jaccard only for pairs whose common neighbor IS a hub. The
    * middle node always has degree ≥ 2 (it touches both a and b), so
    * 1/ln deg is finite; the fan-in runs through exact_sum. Existing
    * edges are removed with one anti-join against the undirected edge
    * set. Returns (idA, idB, cn, aa, jaccard), idA < idB. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Long = 100000L,
      minCommonNeighbors: Long = 1L): DataFrame = {
    require(maxDegree >= 2, "maxDegree must be >= 2")
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
    val und = e0.select(least(col("__a"), col("__b")).as("__a"),
        greatest(col("__a"), col("__b")).as("__b"))
      .distinct().localCheckpoint(true)
    val adj = und.select(col("__a").as("__node"), col("__b").as("__nb"))
      .union(und.select(col("__b").as("__node"), col("__a").as("__nb")))
    val deg = adj.groupBy("__node").agg(count(lit(1)).as("__deg"))
      .localCheckpoint(true)
    val mid = adj.join(deg, Seq("__node"))
      .where(col("__deg") <= maxDegree)
      .select(col("__node").as("__z"), col("__nb"),
        col("__deg").as("__dz"))
    val wedges = mid.as("l").join(mid.as("r"),
        col("l.__z") === col("r.__z") && col("l.__nb") < col("r.__nb"))
      .select(col("l.__nb").as("idA"), col("r.__nb").as("idB"),
        col("l.__dz").as("__dz"))
    val scored = wedges.groupBy("idA", "idB")
      .agg(count(lit(1)).as("cn"),
        exact_sum(lit(1.0) / log(col("__dz").cast("double"))).as("aa"))
      .where(col("cn") >= minCommonNeighbors)
    scored
      .join(und.select(col("__a").as("idA"), col("__b").as("idB")),
        Seq("idA", "idB"), "left_anti")
      .join(deg.select(col("__node").as("idA"), col("__deg").as("__da")),
        Seq("idA"))
      .join(deg.select(col("__node").as("idB"), col("__deg").as("__db")),
        Seq("idB"))
      .select(col("idA"), col("idB"), col("cn"), col("aa"),
        (col("cn").cast("double") /
          (col("__da") + col("__db") - col("cn")).cast("double"))
          .as("jaccard"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, made
    * deterministic): community detection by iterated neighborhood
    * majority vote over the undirected-ized SIMPLE graph (parallel
    * edges collapse, self-loops drop). Every node starts as its own
    * label; each round, a node adopts the most frequent label among
    * its neighbors, ties broken by the SMALLEST label — the
    * deterministic stand-in for classic LPA's random tie-flip, so runs
    * are reproducible and gate-able (classic LPA's convergence
    * argument survives; synchronous updates can 2-cycle on bipartite
    * structures, which fixed `iterations` bounds). Complements
    * [[Dedup.components]] (connectivity) and [[modularity]] (grading):
    * LPA finds DENSITY communities inside one connected component.
    *
    * Scale: label state is O(nodes); each round is one adjacency join
    * + one (node, label) count shuffle + a per-node argmax window —
    * the frequency table is bounded by the adjacency size, never
    * nodes². Per-round localCheckpoint with eager free keeps storage
    * at two label tables ([[pageRank]]'s discipline). Nodes are edge
    * endpoints; every node has ≥ 1 neighbor by construction. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, nodeOut: String = "node",
      labelOut: String = "label"): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
    val adj = e0.select(col("__a").as("__node"), col("__b").as("__nb"))
      .union(e0.select(col("__b").as("__node"), col("__a").as("__nb")))
      .distinct().localCheckpoint(true)
    val nodes = adj.select(col("__node")).distinct().localCheckpoint(true)
    var labels = nodes.select(col("__node"),
      col("__node").as("__label")).localCheckpoint(true)
    var it = 0
    while (it < iterations) {
      val prev = labels
      val counts = adj.join(prev.select(col("__node").as("__nb"),
          col("__label")), Seq("__nb"))
        .groupBy("__node", "__label").agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__node")
        .orderBy(col("__c").desc, col("__label").asc)
      val picked = counts.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).select(col("__node"), col("__label"))
      labels = nodes.join(picked, Seq("__node"), "left")
        .select(col("__node"),
          coalesce(col("__label"), col("__node")).as("__label"))
        .localCheckpoint(true)
      CheckpointUtil.freeCheckpoint(prev)
      it += 1
    }
    CheckpointUtil.freeCheckpoint(adj)
    CheckpointUtil.freeCheckpoint(nodes)
    labels.select(col("__node").as(nodeOut), col("__label").as(labelOut))
  }

  /** Directed modularity (Leicht & Newman 2008) of a node partition
    * over an edge list — "does this community assignment actually
    * concentrate edges":
    * `Q = Σ_c [ e_c/m − (dout_c · din_c) / m² ]` with `e_c` the edges
    * INSIDE community c, `dout_c`/`din_c` its out/in degree sums, and
    * `m` the edge count — all exact LONG censuses; only the final Q is
    * a double. `communities` is a (node, community) table joined onto
    * both endpoints (two node-keyed joins — the communities table is
    * node-sized, broadcastable when nodes are). Returns one row per
    * community (community, n_edges_in, dout, din, q_part) plus the
    * caller sums `q_part` for Q — or use the companion total row from
    * a trivial agg. Unmapped endpoints are refused work (dropped). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      communities: DataFrame, nodeCol: String,
      commCol: String): DataFrame = {
    val cm = communities.select(col(nodeCol).as("__node"),
      col(commCol).as("__c"))
    val e = edges
      .join(cm.select(col("__node").as(srcCol),
        col("__c").as("__cs")), srcCol)
      .join(cm.select(col("__node").as(dstCol),
        col("__c").as("__cd")), dstCol)
    val m = e.count()
    require(m > 0, "edge list is empty after community mapping")
    val outDeg = e.groupBy(col("__cs").as("community"))
      .agg(count(lit(1)).as("dout"))
    val inDeg = e.groupBy(col("__cd").as("community"))
      .agg(count(lit(1)).as("din"))
    val inside = e.where(col("__cs") === col("__cd"))
      .groupBy(col("__cs").as("community"))
      .agg(count(lit(1)).as("n_edges_in"))
    outDeg.join(inDeg, Seq("community"), "full")
      .join(inside, Seq("community"), "full")
      .na.fill(0L, Seq("dout", "din", "n_edges_in"))
      .withColumn("q_part",
        col("n_edges_in").cast("double") / m -
          (col("dout").cast("double") * col("din").cast("double"))
            / (m.toDouble * m.toDouble))
  }
}
