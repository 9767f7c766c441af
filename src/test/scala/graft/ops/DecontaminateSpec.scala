package graft.ops

import graft.SparkTestBase

/** Benchmark decontamination (ops.Decontaminate): n-gram collision test
  * against an eval set, broadcast-probe shape. */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 tail"),  // shares runs with bench doc 100
    (2L, "x1 x2 x3 x4 x5 x6 x7 x8"),          // clean
    (3L, "pre t1 t2 t3 t4 t5 t6 t7 t8"),      // shares one run (t1..t8)
    (4L, "short doc")                         // fewer tokens than window
  ).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")      // spans t1..t8, t2..t9
  ).toDF("doc_id", "text")

  test("sharedSpans: exact distinct-span overlap counts, clean docs absent") {
    val got = Decontaminate.sharedSpans(corpus, bench, "doc_id", "text",
        windowTokens = 8, minShared = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc1 spans: t1..t8, t2..t9, t3..tail → first two collide with bench
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minShared raises the contamination bar") {
    val got = Decontaminate.sharedSpans(corpus, bench, "doc_id", "text",
      windowTokens = 8, minShared = 2)
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val kept = Decontaminate.decontaminate(corpus, bench, "doc_id", "text",
      windowTokens = 8, minShared = 1)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 4L))
  }

  test("overlapPairs attributes contamination to the right bench doc") {
    val multiBench = bench.union(Seq(
      (200L, "x1 x2 x3 x4 x5 x6 x7 x8 tail9")).toDF("doc_id", "text"))
    val got = Decontaminate.overlapPairs(corpus, multiBench, "doc_id", "text",
        windowTokens = 8, minShared = 1)
      .orderBy("doc_id", "bench_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1 ↔ bench100 (2 spans); doc2 ↔ bench200 (x1..x8); doc3 ↔ bench100
    assert(got.toSeq == Seq((1L, 100L, 2L), (2L, 200L, 1L), (3L, 100L, 1L)))
  }

  test("probe side broadcasts: no shuffle touches the corpus grams") {
    val df = Decontaminate.sharedSpans(corpus, bench, "doc_id", "text")
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast semi-join, got:\n$plan")
  }
}
