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

  test("degrees counts both sides with zero-fill") {
    import spark.implicits._
    val d = Graph.degrees(
      Seq("a" -> "b", "a" -> "c", "b" -> "c").toDF("src", "dst"),
      "src", "dst")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(d == Map("a" -> ((2L, 0L)), "b" -> ((1L, 1L)), "c" -> ((0L, 2L))))
  }
}
