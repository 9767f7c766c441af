package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed tables make equi-joins and aggregations exchange-free. */
class BucketingSpec extends SparkTestBase {

  private def withNoBroadcast[A](body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bucketed⋈bucketed: zero Exchange, same result as plain join") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec").toString
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_suppkey", "l_extendedprice")
    val sup = spark.read.parquet(sf("supplier"))
      .select("s_suppkey", "s_nationkey")
    Bucketing.writeBucketed(spark, li, "bspec_li", s"$base/li", "l_suppkey", 4)
    Bucketing.writeBucketed(spark, sup, "bspec_sup", s"$base/sup", "s_suppkey", 4)
    try withNoBroadcast {
      val joined = spark.table("bspec_li")
        .join(spark.table("bspec_sup"), col("l_suppkey") === col("s_suppkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val got = joined.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
        .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
          math.round(r.getDouble(2) * 100) / 100.0)).toSet
      val want = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
        .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
          math.round(r.getDouble(2) * 100) / 100.0)).toSet
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_li")
      spark.sql("DROP TABLE IF EXISTS bspec_sup")
    }
  }

  test("bucket pruning: equality filter on the bucket key scans ONE bucket") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec3").toString
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_suppkey", "l_quantity")
    Bucketing.writeBucketed(spark, li, "bspec_li3", s"$base/li", "l_suppkey", 8)
    // the auto-bucketed-scan heuristic turns bucketed reading off for plain
    // filter queries (no partitioning requirement) — force it on so the
    // bucket-pruning path is exercised
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("bspec_li3").where(col("l_suppkey") === 3L)
      val rows = q.collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(0) == 3L))
      // the scan itself must report bucket pruning: 1 of 8 buckets selected
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in scan:\n$plan")
      // scan-level row metric: only the selected bucket's rows were read,
      // not the whole table (bucket files hold ~1/8 of rows each)
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
      val scanned = scan.metrics("numOutputRows").value
      val total = li.count()
      assert(scanned < total / 2,
        s"scan read $scanned of $total rows — bucket pruning not effective")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bspec_li3")
    }
  }

  test("groupBy on the bucket key is exchange-free too") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec2").toString
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_suppkey", "l_quantity")
    Bucketing.writeBucketed(spark, li, "bspec_li2", s"$base/li", "l_suppkey", 4)
    try {
      val agg = spark.table("bspec_li2").groupBy("l_suppkey")
        .agg(sum("l_quantity").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
      // and the numbers are right
      val got = agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = li.groupBy("l_suppkey").agg(sum("l_quantity").as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet &&
        got.forall { case (k, v) => math.abs(v - want(k)) < 1e-6 })
    } finally spark.sql("DROP TABLE IF EXISTS bspec_li2")
  }
}
