package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VocabSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b b c c c"),
    (2L, "c d a"),
    (3L, ""),
    (4L, "e  e\tb")).toDF("doc_id", "text")

  test("build ranks by (count desc, token asc) with dense 0-based ids") {
    val v = Vocab.build(docs, col("text"))
      .orderBy("token_id")
      .as[(String, Long, Long)].collect().toSeq
    // counts: c=4, b=3, a=2, e=2, d=1 → ties (a,e) break on token asc
    assert(v == Seq(("c", 0L, 4L), ("b", 1L, 3L), ("a", 2L, 2L),
      ("e", 3L, 2L), ("d", 4L, 1L)))
  }

  test("minCount and maxSize prune the tail") {
    val v = Vocab.build(docs, col("text"), minCount = 2, maxSize = 3)
      .orderBy("token_id").as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("c", 0L, 4L), ("b", 1L, 3L), ("a", 2L, 2L)))
  }

  test("encode maps tokens to ids, OOV to unkId, empty docs to []") {
    val vocab = Vocab.build(docs, col("text"), minCount = 2)
    val got = Vocab.encode(docs, "doc_id", col("text"), vocab, unkId = -1L)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(got == Seq(
      1L -> Seq(2L, 1L, 1L, 0L, 0L, 0L),
      2L -> Seq(0L, -1L, 2L), // d is OOV under minCount=2
      3L -> Seq(),
      4L -> Seq(3L, 3L, 1L)))
  }

  test("encode is deterministic under repartitioning") {
    val vocab = Vocab.build(docs, col("text"))
    val a = Vocab.encode(docs, "doc_id", col("text"), vocab)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    val b = Vocab.encode(docs.repartition(7), "doc_id", col("text"), vocab)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(a == b)
  }

  test("coverage fractions are the ranked prefix sums") {
    val cov = Vocab.coverage(docs, col("text"), Seq(1L, 2L, 4L, 100L))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // total=12; top1 c=4, top2 +b=7, top4 +a+e=11, top100 all=12
    assert(cov == Seq(
      (1L, 4L, 12L, math.rint(4.0 / 12 * 1e9) / 1e9),
      (2L, 7L, 12L, math.rint(7.0 / 12 * 1e9) / 1e9),
      (4L, 11L, 12L, math.rint(11.0 / 12 * 1e9) / 1e9),
      (100L, 12L, 12L, 1.0)))
  }

  test("coverage on an empty corpus yields zero rows covered") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cov = Vocab.coverage(empty, col("text"), Seq(5L))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(cov == Seq((5L, 0L, 0L, 0.0)))
  }

  test("plan shape: one corpus count shuffle; encode broadcasts the vocab") {
    val vocab = Vocab.build(docs, col("text"))
    val enc = Vocab.encode(docs, "doc_id", col("text"), vocab)
    enc.collect()
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin") == false && plan.contains("Broadcast"),
      s"vocab join must broadcast:\n$plan")
  }

  test("build's rank window is partition-local (no global-sort funnel)") {
    // the two-level rank must not plan a partition-less Window (whose
    // Exchange SinglePartition funnels the whole type table through one
    // task); assert on the OPTIMIZED logical plan — AQE hides physical
    // WindowExec nodes inside query stages (see verify notes)
    val built = Vocab.build(docs, col("text"))
    built.collect()
    val windows = built.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the rank Window to survive")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"partition-less Window (single-task funnel):\n$w"))
    assert(!built.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
  }
}
