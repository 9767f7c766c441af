package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Per-group quantile bucketing (Quality.rankBuckets): exact ranks,
  * cutoff arithmetic, cross-partitioning determinism, group isolation. */
class RankBucketsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Double)], hp: Int, mp: Int) =
    Quality.rankBuckets(rows.toDF("id", "g", "s"), col("g"), col("s"),
        col("id"), hp, mp)
      .select("id", "g", "rank_in_group", "n_group", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(_._1).toList

  test("ranks ascending per group; 10/40/50 cutoffs") {
    // group a: 10 rows, scores = id → head = rank 1, middle = 2..5
    val rows = (1L to 10L).map(i => (i, "a", i.toDouble))
    val got = run(rows, 10, 40)
    assert(got.map(_._3) == (1L to 10L).toList)
    assert(got.forall(_._4 == 10L))
    assert(got.map(_._5) == List("head") ++ List.fill(4)("middle") ++
      List.fill(5)("tail"))
  }

  test("floor cutoffs: tiny groups may have empty head") {
    // n = 3, headPct 10 → floor(0.3) = 0 head rows; mid cut floor(1.5)=1
    val got = run(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0)),
      10, 40)
    assert(got.map(_._5) == List("middle", "tail", "tail"))
  }

  test("groups rank independently") {
    val rows = Seq((1L, "a", 5.0), (2L, "a", 1.0),
      (3L, "b", 9.0), (4L, "b", 2.0), (5L, "b", 4.0))
    val got = run(rows, 0, 50)
    assert(got == List(
      (1L, "a", 2L, 2L, "tail"), (2L, "a", 1L, 2L, "middle"),
      (3L, "b", 3L, 3L, "tail"), (4L, "b", 1L, 3L, "middle"),
      (5L, "b", 2L, 3L, "tail")))
  }

  test("ties break by the tie column") {
    val got = run(Seq((4L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0)),
      0, 100)
    assert(got.map(t => t._1 -> t._3) == List(2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("deterministic across partitionings (fixture-scale)") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("lang"), length(col("text")).as("s"))
    def go(df: org.apache.spark.sql.DataFrame) =
      Quality.rankBuckets(df, col("lang"), col("s"), col("doc_id"), 10, 40)
        .select("doc_id", "rank_in_group", "n_group", "bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toList
    val a = go(docs)
    val b = go(docs.repartition(13))
    assert(a.nonEmpty && a == b)
    // rank sanity: each group covers 1..n exactly once
    val byLang = Quality.rankBuckets(docs, col("lang"), col("s"),
        col("doc_id"), 10, 40)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        min("rank_in_group").as("mn"), max("rank_in_group").as("mx"),
        count_distinct(col("rank_in_group")).as("d"))
      .collect()
    byLang.foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == r.getLong(1) &&
        r.getLong(4) == r.getLong(1))
    }
  }

  test("no single-partition window in the plan") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("lang"), length(col("text")).as("s"))
    val out = Quality.rankBuckets(docs, col("lang"), col("s"),
      col("doc_id"), 10, 40)
    out.collect()
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "every window must be partitioned"))
  }

  test("percent bounds validated") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "g", "s")
    intercept[IllegalArgumentException] {
      Quality.rankBuckets(df, col("g"), col("s"), col("id"), 60, 50)
    }
  }
}
