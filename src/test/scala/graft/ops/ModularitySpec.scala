package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Directed modularity (Graph.modularity). */
class ModularitySpec extends SparkTestBase {

  test("modularity: hand-worked two-community census") {
    import spark.implicits._
    // 4 edges: 3 inside communities, 1 crossing
    val edges = Seq(("a1", "a2"), ("a2", "a1"), ("b1", "b2"),
      ("a1", "b1")).toDF("src", "dst")
    val comm = Seq(("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B"))
      .toDF("node", "comm")
    val got = Graph.modularity(edges, "src", "dst", comm,
        "node", "comm")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    // A: 2 inside, dout 3 (a1->a2, a2->a1, a1->b1), din 2
    assert(a.getLong(a.fieldIndex("n_edges_in")) == 2L)
    assert(a.getLong(a.fieldIndex("dout")) == 3L)
    assert(a.getLong(a.fieldIndex("din")) == 2L)
    assert(math.abs(a.getDouble(a.fieldIndex("q_part")) -
      (2.0 / 4 - 3.0 * 2.0 / 16)) < 1e-15)
    val b = got("B")
    assert(b.getLong(b.fieldIndex("n_edges_in")) == 1L)
    assert(math.abs(b.getDouble(b.fieldIndex("q_part")) -
      (1.0 / 4 - 1.0 * 2.0 / 16)) < 1e-15)
    // a perfect partition (drop the crossing edge) scores higher
    val q1 = got.values.map(_.getDouble(4)).sum
    val better = Graph.modularity(edges.limit(3), "src", "dst", comm,
      "node", "comm").collect().map(_.getDouble(4)).sum
    assert(better > q1)
  }
}
