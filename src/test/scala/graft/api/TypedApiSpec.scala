package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Typed Dataset Aggregator API over the same kernels as the SQL surface. */
class TypedApiSpec extends SparkTestBase {
  import spark.implicits._

  test("typed summaryStats matches built-ins on lineitem") {
    val ds = spark.read.parquet(sf("lineitem"))
      .select(col("l_extendedprice")).as[Double]
    val r = ds.select(Aggregators.summaryStats.toColumn).head()
    val b = spark.read.parquet(sf("lineitem"))
      .agg(count("l_extendedprice"), sum("l_extendedprice"),
        min("l_extendedprice"), max("l_extendedprice"),
        avg("l_extendedprice"), var_pop("l_extendedprice")).head()
    assert(r.count == b.getLong(0))
    assert(math.abs(r.sum - b.getDouble(1)) < 1e-6)
    assert(r.min == b.getDouble(2) && r.max == b.getDouble(3))
    assert(math.abs(r.mean - b.getDouble(4)) < 1e-9)
    assert(math.abs(r.variance - b.getDouble(5)) < 1e-3)
  }

  test("typed quantile within tolerance; groupwise via KeyValueGroupedDataset") {
    val li = spark.read.parquet(sf("lineitem"))
    val exact = li.stat.approxQuantile("l_quantity", Array(0.5), 0.0).head
    val got = li.select(col("l_quantity")).as[Double]
      .select(Aggregators.quantile(0.5).toColumn).head()
    assert(math.abs(got - exact) <= 2.0, s"median $got vs $exact")

    val grouped = li.select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(Aggregators.quantile(0.5).toColumn)
      .collect().toMap
    assert(grouped.keySet == Set("A", "N", "R"))
    grouped.values.foreach(v => assert(v > 0 && v <= 50))
  }

  test("typed tdigestSketch output interops with the SQL finishers") {
    val ds = spark.read.parquet(sf("orders"))
      .select(col("o_totalprice")).as[Double]
    val bytes = ds.select(Aggregators.tdigestSketch().toColumn).head()
    val t = graft.core.TDigest.deserialize(bytes)
    val n = spark.read.parquet(sf("orders")).count()
    assert(t.totalSize == n.toDouble)
  }

  test("typed exactSum == exact_sum column aggregate, partitioning-invariant") {
    import spark.implicits._
    val li = spark.read.parquet(sf("lineitem"))
    val viaCol = li.agg(graft.api.functions.exact_sum(col("l_extendedprice")))
      .head().getDouble(0)
    val vals = li.select(col("l_extendedprice")).as[Double]
    Seq(vals.repartition(1), vals.repartition(13)).foreach { ds =>
      val got = ds.select(Aggregators.exactSum.toColumn).head()
      assert(got == viaCol) // identical bits, typed path included
    }
    // empty Dataset → 0.0 (typed API has no SQL null)
    assert(spark.emptyDataset[Double]
      .select(Aggregators.exactSum.toColumn).head() == 0.0)
  }
}
