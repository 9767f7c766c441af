package graft.ops

import graft.SparkTestBase
import graft.api.{functions => gf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BudgetSampleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a", 100L), (2L, "a", 150L), (3L, "a", 300L), (4L, "a", 50L),
    (5L, "b", 400L), (6L, "b", 10L),
    (7L, "c", 9999L)).toDF("id", "src", "cost")

  private def hashOrder(ids: Seq[Long]): Seq[Long] = {
    // the sampler's order: unsigned hash64(id)
    val h = docs.where(col("id").isin(ids: _*))
      .select(col("id"), gf.hash64(col("id"))
        .bitwiseXOR(lit(Long.MinValue)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.sortBy(h)
  }

  test("keep rule: cumulative cost before the doc must be under budget") {
    val kept = Sampling.budgetSample(docs, col("src"), col("id"),
        col("cost"), 300L)
      .select("id").as[Long].collect().toSet
    // recompute expected by walking each group in hash order
    val expected = Seq("a", "b", "c").flatMap { g =>
      val ids = docs.where(col("src") === g).select("id")
        .as[Long].collect().toSeq
      val costs = docs.where(col("src") === g)
        .select("id", "cost").as[(Long, Long)].collect().toMap
      var cum = 0L
      hashOrder(ids).flatMap { id =>
        val keep = cum < 300L
        cum += costs(id)
        if (keep) Some(id) else None
      }
    }.toSet
    assert(kept == expected)
    assert(kept.count(docs.where(col("src") === "a").select("id")
      .as[Long].collect().toSet) >= 1)
  }

  test("every non-empty group keeps at least one doc (overshoot <= 1 doc)") {
    val kept = Sampling.budgetSample(docs, col("src"), col("id"),
      col("cost"), 1L)
    val perGroup = kept.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(perGroup == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("deterministic under repartitioning and subset-monotone in budget") {
    val a = Sampling.budgetSample(docs, col("src"), col("id"),
      col("cost"), 300L).select("id").as[Long].collect().toSet
    val b = Sampling.budgetSample(docs.repartition(7), col("src"),
      col("id"), col("cost"), 300L).select("id").as[Long].collect().toSet
    assert(a == b)
    val small = Sampling.budgetSample(docs, col("src"), col("id"),
      col("cost"), 150L).select("id").as[Long].collect().toSet
    assert(small.subsetOf(a), "smaller budget must be a subset")
  }

  test("null group dropped, null cost counts as zero") {
    val withNulls = Seq((1L, "a", Some(10L)), (2L, null, Some(10L)),
      (3L, "a", None)).toDF("id", "src", "cost")
    val kept = Sampling.budgetSample(withNulls, col("src"), col("id"),
      col("cost"), 100L).select("id").as[Long].collect().toSet
    assert(!kept.contains(2L) && kept.contains(1L) && kept.contains(3L))
  }
}
