package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.{abs, col, max}

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

  test("noveltyScores: hand-checked fractions, every doc present, edges") {
    val corp = Seq(
      (1L, "a b c d e"),       // windows(2): ab bc cd de → 4 distinct
      (2L, "a b a b a b"),     // windows: ab ba → 2 distinct
      (3L, "z1 z2 z3"),        // z1z2 z2z3 — nothing in ref
      (4L, "solo")             // too short for a 2-token window
    ).toDF("doc_id", "text")
    val ref = Seq((100L, "a b c x y"), (101L, "q r"))  // ref grams: ab bc cx xy qr
      .toDF("doc_id", "text")
    val got = Decontaminate.noveltyScores(corp, ref, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((4L, 2L, 0.5)))         // ab, bc seen; cd, de novel
    assert(got(2L)._1 == 2L && got(2L)._2 == 1L && got(2L)._3 == 0.5)
    assert(got(3L) == ((2L, 0L, 1.0)))         // fully novel
    assert(got(4L)._1 == 0L && got(4L)._3.isNaN) // no windows → NULL novelty
    // novelty against ONESELF is exactly zero
    val self = Decontaminate.noveltyScores(corp, corp, "doc_id", "text", 2)
      .where(col("novelty").isNotNull)
      .agg(max(abs(col("novelty")))).collect()(0).getDouble(0)
    assert(self == 0.0)
  }
}
