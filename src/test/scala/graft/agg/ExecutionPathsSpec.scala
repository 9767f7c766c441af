package graft.agg

import graft.SparkTestBase
import graft.api.{functions => gf}
import org.apache.spark.sql.functions._

/** The two execution paths a 100 TB run depends on, exercised explicitly:
  *  - ObjectHashAggregate's sort-based fallback (high group cardinality /
  *    memory pressure spill path) must produce identical exact results;
  *  - results of exact operators must be invariant to input partitioning.
  */
class ExecutionPathsSpec extends SparkTestBase {

  private def exactResults(): Map[String, Seq[String]] = {
    val li = spark.read.parquet(sf("lineitem"))
    val stats = li.groupBy("l_orderkey") // ~1500 groups at sf0.001
      .agg(gf.summary_stats(col("l_quantity")).as("st"))
      .select(col("l_orderkey"),
        gf.stats_count(col("st")).as("c"), gf.stats_sum(col("st")).as("s"),
        gf.stats_min(col("st")).as("mn"), gf.stats_max(col("st")).as("mx"))
      .orderBy("l_orderkey").collect().map(_.toString).toSeq
    val td = li.groupBy("l_returnflag")
      .agg(gf.tdigest(col("l_quantity")).as("d"))
      .select(col("l_returnflag"), gf.tdigest_size(col("d")).as("n"),
        gf.tdigest_min(col("d")).as("mn"), gf.tdigest_max(col("d")).as("mx"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val ss = li.agg(gf.ss_topk_agg(col("l_partkey"), lit(1L), 4096).as("sk"))
      .select(explode(gf.ss_topk_long(col("sk"), 4096)).as("c"))
      .select("c.item", "c.count").orderBy("item").collect().map(_.toString).toSeq
    // exact_sum: the spill path serializes the superaccumulator mid-group,
    // so fallback exercises deserialize→merge (bit-equality is the contract)
    val es = li.groupBy("l_orderkey")
      .agg(gf.exact_sum(col("l_extendedprice")).as("t"))
      .orderBy("l_orderkey").collect().map(_.toString).toSeq
    Map("stats" -> stats, "tdigest" -> td, "ss" -> ss, "exact_sum" -> es)
  }

  test("sort-based fallback (threshold=2) produces identical exact results") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val orig = spark.conf.get(key)
    val baseline = exactResults()
    try {
      spark.conf.set(key, "2") // force the spill path for every aggregation
      val fallback = exactResults()
      baseline.foreach { case (name, rows) =>
        assert(fallback(name) == rows, s"$name diverged under sort fallback")
      }
    } finally spark.conf.set(key, orig)
  }

  test("exact results invariant to input partitioning (1, 3, 17 partitions)") {
    val li = spark.read.parquet(sf("lineitem"))
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.groupBy("l_returnflag")
        .agg(gf.summary_stats(col("l_quantity")).as("st"),
          gf.ss_topk_agg(col("l_partkey"), lit(1L), 4096).as("sk"))
        .select(col("l_returnflag"),
          gf.stats_count(col("st")).as("c"), gf.stats_sum(col("st")).as("s"),
          gf.stats_min(col("st")), gf.stats_max(col("st")),
          gf.ss_size(col("sk")))
        .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val base = run(li.coalesce(1))
    Seq(3, 17).foreach { n =>
      assert(run(li.repartition(n)) == base, s"diverged at $n partitions")
    }
  }
}
