package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Dedup-aware contrastive batch assignment (Dedup.spreadAcrossBatches). */
class BatchSpreadSpec extends SparkTestBase {

  private def clusters = {
    import spark.implicits._
    // component 100: 5 members; component 200: 2; singletons 1..3
    (Seq((100L, 100L), (101L, 100L), (102L, 100L), (103L, 100L),
      (104L, 100L), (200L, 200L), (201L, 200L)) ++
      (1L to 3L).map(i => (i, i))).toDF("id", "component")
  }

  test("members of one component land in distinct batches (size <= B)") {
    val out = Dedup.spreadAcrossBatches(clusters, nBatches = 8, seed = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byComp = out.groupBy(_._2)
    assert(byComp(100L).map(_._3).distinct.length == 5)
    assert(byComp(200L).map(_._3).distinct.length == 2)
    assert(out.forall(r => r._3 >= 0 && r._3 < 8))
  }

  test("components larger than B wrap with minimal collisions") {
    import spark.implicits._
    val big = (0L until 10L).map(i => (i, 0L)).toDF("id", "component")
    val out = Dedup.spreadAcrossBatches(big, nBatches = 4, seed = 7)
      .collect().map(_.getLong(2))
    // 10 members over 4 batches: counts are ceil/floor(10/4) = {3,3,2,2}
    val counts = out.groupBy(identity).view.mapValues(_.length).values.toSeq.sorted
    assert(counts == Seq(2, 2, 3, 3))
  }

  test("rank is id-ordered: consecutive ids round-robin consecutively") {
    val out = Dedup.spreadAcrossBatches(clusters, nBatches = 8, seed = 7)
      .where(col("component") === 100L).orderBy("id")
      .collect().map(_.getLong(2))
    // consecutive ranks differ by exactly 1 mod 8
    out.sliding(2).foreach { case Array(a, b) =>
      assert((a + 1) % 8 == b % 8)
    }
  }

  test("deterministic under repartitioning") {
    val a = Dedup.spreadAcrossBatches(clusters.repartition(7), 8, 7)
      .orderBy("id").collect().toSeq
    val b = Dedup.spreadAcrossBatches(clusters.coalesce(1), 8, 7)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
