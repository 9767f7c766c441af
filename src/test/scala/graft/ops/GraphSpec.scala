package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Link-graph centrality (Graph.pageRank / Graph.degrees). */
class GraphSpec extends SparkTestBase {

  /** Sequential reference: same semantics, plain double arithmetic.
    * exact_sum is correctly rounded, so the distributed result may differ
    * from this left-to-right fold by ulps — compare with 1e-12. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outdeg.contains).map(rank).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / outdeg(s) }.sum).toMap
      rank = nodes.map(v => v ->
        ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String)], iters: Int = 10,
      d: Double = 0.85): Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("pageRank matches the sequential reference on a hand-built graph") {
    // Classic 4-node example: d is a sink (dangling).
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a",
      "b" -> "d", "c" -> "d")
    val got = run(edges)
    val want = refPageRank(edges, 10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12,
      s"$k: $v vs ${want(k)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("dangling mass is redistributed: ranks sum to 1 with sinks present") {
    // Star into a sink: everything flows to z, z teleports back.
    val edges = (1 to 20).map(i => s"n$i" -> "z")
    val got = run(edges, iters = 25)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got("z") > got("n1"))
    // Leaves are symmetric — all identical bits.
    assert((1 to 20).map(i => got(s"n$i")).distinct.size == 1)
  }

  test("parallel edges carry proportional weight") {
    // a->b twice + a->c once: b receives 2/3 of a's share.
    val dup = run(Seq("a" -> "b", "a" -> "b", "a" -> "c"), iters = 1)
    val single = run(Seq("a" -> "b", "a" -> "c"), iters = 1)
    assert(dup("b") > dup("c"))
    assert(math.abs(single("b") - single("c")) < 1e-15)
  }

  test("bit-identical across input partitionings") {
    import spark.implicits._
    val edges = (0 until 300).map(i =>
      (s"s${i % 17}", s"s${(i * 7 + 3) % 23}"))
    val df = edges.toDF("src", "dst")
    def bits(parts: Int): Map[String, Long] =
      Graph.pageRank(df.repartition(parts), "src", "dst", 8, 0.85)
        .collect()
        .map(r => r.getString(0) ->
          java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    assert(bits(1) == bits(7))
  }

  test("randomized graphs match the sequential reference (dangling mixes, multi-edges)") {
    val rng = new scala.util.Random(31)
    for (trial <- 0 until 5) {
      val nNodes = 5 + rng.nextInt(20)
      val nEdges = 3 + rng.nextInt(60)
      val edges = Seq.fill(nEdges)(
        (s"n${rng.nextInt(nNodes)}", s"n${rng.nextInt(nNodes)}"))
      val got = run(edges, iters = 6)
      val want = refPageRank(edges, 6, 0.85)
      assert(got.keySet == want.keySet, s"trial $trial")
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-12, s"trial $trial $k: $v vs ${want(k)}")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"trial $trial mass")
    }
  }

  test("self-loops are honored, empty edge set yields empty result") {
    val got = run(Seq("a" -> "a", "a" -> "b", "b" -> "a"), iters = 5)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    import spark.implicits._
    val empty = Graph.pageRank(
      Seq.empty[(String, String)].toDF("src", "dst"), "src", "dst")
    assert(empty.count() == 0)
  }

  test("tol early exit: converged ranks match the full fixed-iteration run") {
    import spark.implicits._
    val df = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a",
      "b" -> "d", "c" -> "d").toDF("src", "dst")
    def m(out: org.apache.spark.sql.DataFrame): Map[String, Double] =
      out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = m(Graph.pageRank(df, "src", "dst", 60, 0.85))
    val early = m(Graph.pageRank(df, "src", "dst", 60, 0.85, tol = 1e-10))
    assert(full.keySet == early.keySet)
    full.foreach { case (k, v) => assert(math.abs(v - early(k)) < 1e-8,
      s"$k: $v vs ${early(k)}") }
    assert(math.abs(early.values.sum - 1.0) < 1e-12)
  }

  test("tol stop actually triggers: huge tol == exactly one iteration, bit-for-bit") {
    import spark.implicits._
    val df = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
      .toDF("src", "dst")
    def bits(out: org.apache.spark.sql.DataFrame): Map[String, Long] =
      out.collect().map(r => r.getString(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    val one = bits(Graph.pageRank(df, "src", "dst", 1, 0.85))
    val stopped = bits(Graph.pageRank(df, "src", "dst", 50, 0.85, tol = 10.0))
    assert(stopped == one)
  }

  /** Sequential HITS reference: L1-normalized half-steps, plain doubles.
    * exact_sum is correctly rounded → compare at 1e-12. */
  private def refHits(edges: Seq[(String, String)],
      iters: Int): Map[String, (Double, Double)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 1.0).toMap
    def norm(m: Map[String, Double]): Map[String, Double] = {
      val s = m.values.sum
      if (s > 0) m.view.mapValues(_ / s).toMap else m.view.mapValues(_ => 0.0).toMap
    }
    for (_ <- 0 until iters) {
      auth = norm(nodes.map(v => v ->
        edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap)
      hub = norm(nodes.map(v => v ->
        edges.filter(_._1 == v).map(e => auth(e._2)).sum).toMap)
    }
    nodes.map(v => v -> ((hub(v), auth(v)))).toMap
  }

  private def runHits(edges: Seq[(String, String)],
      iters: Int = 10): Map[String, (Double, Double)] = {
    import spark.implicits._
    Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
  }

  test("hits matches the sequential reference on a hand-built graph") {
    val edges = Seq("a" -> "c", "b" -> "c", "c" -> "d", "a" -> "d")
    val got = runHits(edges)
    val want = refHits(edges, 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (h, a)) =>
      assert(math.abs(h - want(k)._1) < 1e-12, s"hub $k: $h vs ${want(k)._1}")
      assert(math.abs(a - want(k)._2) < 1e-12, s"auth $k: $a vs ${want(k)._2}")
    }
    // both sides L1-normalized
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-12)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
    // d is cited by the best hub AND c → top authority; a links to both
    // strong authorities → top hub; d links nowhere → hub 0
    assert(got("d")._2 >= got.values.map(_._2).max - 1e-15)
    assert(got("a")._1 >= got.values.map(_._1).max - 1e-15)
    assert(got("d")._1 == 0.0)
  }

  test("hits: source-only nodes have authority 0, sink-only nodes hub 0") {
    val got = runHits(Seq("s" -> "t", "s" -> "u"), iters = 3)
    assert(got("s")._2 == 0.0)
    assert(got("t")._1 == 0.0 && got("u")._1 == 0.0)
    assert(math.abs(got("t")._2 + got("u")._2 - 1.0) < 1e-12)
  }

  test("hits: parallel edges weight the endpoint proportionally") {
    val dup = runHits(Seq("a" -> "b", "a" -> "b", "a" -> "c"), iters = 1)
    // authority from a's unit hub: b gets 2 raw, c gets 1 → 2/3 vs 1/3
    assert(math.abs(dup("b")._2 - 2.0 / 3) < 1e-12)
    assert(math.abs(dup("c")._2 - 1.0 / 3) < 1e-12)
  }

  test("hits: empty edge set yields an empty typed frame") {
    import spark.implicits._
    val out = Graph.hits(Seq.empty[(String, String)].toDF("src", "dst"),
      "src", "dst", 5)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("node", "hub", "authority"))
  }

  test("hits is bit-deterministic across partitionings") {
    import spark.implicits._
    val edges = (0 until 300).map(i => (s"n${i % 37}", s"n${(i * 7 + 3) % 41}"))
    def bits(parts: Int): Map[String, (Long, Long)] =
      Graph.hits(edges.toDF("src", "dst").repartition(parts), "src", "dst", 6)
        .collect().map(r => r.getString(0) ->
          ((java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
            java.lang.Double.doubleToRawLongBits(r.getDouble(2))))).toMap
    assert(bits(1) == bits(13))
  }

  test("degrees counts both sides with zero-fill") {
    import spark.implicits._
    val d = Graph.degrees(
      Seq("a" -> "b", "a" -> "c", "b" -> "c").toDF("src", "dst"),
      "src", "dst")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(d == Map("a" -> ((2L, 0L)), "b" -> ((1L, 1L)), "c" -> ((0L, 2L))))
  }
  test("linkPrediction: path and square hand examples") {
    import spark.implicits._
    // path a-b-c: only (a,c) predicted, via middle b (deg 2)
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = Graph.linkPrediction(path, "src", "dst").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "c")
    assert(r.getLong(r.fieldIndex("cn")) == 1L)
    assert(math.abs(r.getDouble(r.fieldIndex("aa")) - 1.0 / math.log(2)) < 1e-12)
    assert(r.getDouble(r.fieldIndex("jaccard")) == 1.0)
    // square a-b-c-d-a: diagonals (a,c) and (b,d), cn = 2 each
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val g2 = Graph.linkPrediction(sq, "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    assert(g2.keySet == Set(("a", "c"), ("b", "d")))
    assert(g2(("a", "c")) == ((2L, 1.0))) // 2/(2+2-2)
  }

  test("linkPrediction: adjacent pairs never predicted; reverse/parallel " +
      "edges and self-loops collapse") {
    import spark.implicits._
    val tri = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
      ("a", "a")).toDF("src", "dst")
    // triangle: every pair adjacent -> nothing to predict
    assert(Graph.linkPrediction(tri, "src", "dst").count() == 0)
  }

  test("linkPrediction: maxDegree excludes hub middles; " +
      "minCommonNeighbors filters") {
    import spark.implicits._
    // star: hub h with 4 leaves; all leaf pairs share only the hub
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"))
      .toDF("src", "dst")
    assert(Graph.linkPrediction(star, "src", "dst").count() == 6)
    assert(Graph.linkPrediction(star, "src", "dst", maxDegree = 3).count() == 0)
    assert(Graph.linkPrediction(star, "src", "dst",
      minCommonNeighbors = 2).count() == 0)
  }

  test("labelPropagation: two cliques bridged by one edge keep their " +
      "min-id labels") {
    import spark.implicits._
    val clique = (xs: Seq[String]) =>
      for (a <- xs; b <- xs if a < b) yield (a, b)
    val edges = (clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a1", "b1"))
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, "src", "dst", 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("a2", "a3", "a4").forall(n => got(n) == "a1"))
    assert(Seq("b2", "b3", "b4").forall(n => got(n) == "b1"))
  }

  test("labelPropagation: zero iterations = identity labels; " +
      "deterministic across partitionings") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val id = Graph.labelPropagation(edges, "src", "dst", 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(id.forall { case (n, l) => n == l })
    val one = Graph.labelPropagation(edges.repartition(1), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    val many = Graph.labelPropagation(edges.repartition(7), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(one == many)
  }
}
