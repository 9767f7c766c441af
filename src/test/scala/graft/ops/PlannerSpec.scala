package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.CountMin

/** CMS join-size / F2 estimation (Planner, CountMin.innerProductFromBlobs,
  * cms_dot). */
class PlannerSpec extends SparkTestBase {

  test("innerProductFromBlobs equals the exact Σ f_A·f_B on a wide sketch") {
    // width 4096 >> 50 distinct keys: no collisions, estimate is exact
    val a = new CountMin(4, 4096)
    val b = new CountMin(4, 4096)
    (1 to 50).foreach(k => (0 until k).foreach(_ => a.add(k.toLong)))
    (1 to 30).foreach(k => (0 until 2 * k).foreach(_ => b.add(k.toLong)))
    val expected = (1 to 30).map(k => k.toLong * (2L * k)).sum
    assert(CountMin.innerProductFromBlobs(a.serialize(), b.serialize())
      == expected)
  }

  test("inner product is an upper bound under collisions") {
    val a = new CountMin(4, 16)
    val b = new CountMin(4, 16)
    (1 to 200).foreach(k => a.add(k.toLong))
    (1 to 200).foreach(k => b.add(k.toLong))
    val est = CountMin.innerProductFromBlobs(a.serialize(), b.serialize())
    assert(est >= 200L) // true Σ f·f = 200 (all counts 1)
  }

  test("shape mismatch is refused") {
    val a = new CountMin(4, 16)
    val b = new CountMin(4, 32)
    intercept[IllegalArgumentException] {
      CountMin.innerProductFromBlobs(a.serialize(), b.serialize())
    }
  }

  test("saturation instead of wrap on overflow-sized counters") {
    val a = new CountMin(1, 2)
    a.add(0L, Long.MaxValue / 2)
    a.add(1L, Long.MaxValue / 2)
    val est = CountMin.innerProductFromBlobs(a.serialize(), a.serialize())
    assert(est == Long.MaxValue)
  }

  test("Planner.joinSizeEstimate is exact for a collision-free FK join") {
    import spark.implicits._
    val orders = (1L to 100L).map(k => (k, s"o$k")).toDF("okey", "pay")
    val items = (1L to 100L).flatMap(k =>
      (0 until (k % 5).toInt).map(i => (k, i))).toDF("okey", "line")
    val exact = items.join(orders, "okey").count()
    val row = Planner.joinSizeEstimate(items, col("okey"),
      orders, col("okey")).collect()(0)
    assert(row.getLong(0) == exact)
    assert(row.getLong(1) == items.count())
    assert(row.getLong(2) == 100L)
  }

  test("selfJoinSizeEstimate recovers F2 and the skew ratio") {
    import spark.implicits._
    // one heavy key (100 rows) + 100 singletons: F2 = 10000 + 100
    val df = ((1 to 100).map(_ => 7L) ++ (1000L until 1100L))
      .toDF("k")
    val row = Planner.selfJoinSizeEstimate(df, col("k")).collect()(0)
    assert(row.getLong(0) == 10100L)
    assert(row.getLong(1) == 200L)
    assert(math.abs(row.getDouble(2) - 50.5) < 1e-12)
  }

  test("shufflePlan: exact quantities on a skewed key, flag fires") {
    import spark.implicits._
    // one key with 500 rows + 100 singletons; tiny task target
    val df = ((1 to 500).map(_ => 7L) ++ (1000L until 1100L)).toDF("k")
    val r = Planner.shufflePlan(df, col("k"), targetRowsPerTask = 100L)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_rows")) == 600L)
    // 101 distinct, low cardinality -> HLL linear counting is exact here
    assert(math.abs(r.getDouble(r.fieldIndex("est_distinct")) - 101.0) < 2.0)
    assert(r.getLong(r.fieldIndex("top_key")) == 7L)
    assert(r.getLong(r.fieldIndex("top_count")) == 500L)
    assert(r.getLong(r.fieldIndex("est_f2")) == 500L * 500L + 100L)
    assert(r.getLong(r.fieldIndex("suggested_tasks")) == 6L)
    // 500 * 6 = 3000 > 2 * 600 -> salt
    assert(r.getInt(r.fieldIndex("salt_hot")) == 1)
  }

  test("shufflePlan: uniform key does not flag") {
    import spark.implicits._
    val df = (1L to 600L).toDF("k")
    val r = Planner.shufflePlan(df, col("k"), targetRowsPerTask = 100L)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("top_count")) == 1L)
    assert(r.getInt(r.fieldIndex("salt_hot")) == 0)
    // top tie at count 1 breaks to the smallest key
    assert(r.getLong(r.fieldIndex("top_key")) == 1L)
  }

  test("cms_dot is callable from SQL") {
    import spark.implicits._
    (1L to 10L).toDF("k").createOrReplaceTempView("plannerspec_t")
    val r = spark.sql(
      """SELECT cms_dot(s, s) AS f2 FROM
         (SELECT cms_agg(k, 4, 256) AS s FROM plannerspec_t)""")
      .collect()(0)
    assert(r.getLong(0) == 10L)
  }

  test("chinchillaPlan: 20 tokens/param plan under the epoch ceiling") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // corpus of 1000 tokens, ceiling 4 epochs -> 4000 token capacity
    val df = Seq(400L, 600L).toDF("toks")
    val got = Planner.chinchillaPlan(df, col("toks"),
        Seq(100L, 200L, 500L), maxEpochs = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val m100 = got(100L) // needs 2000 <= 4000: feasible, 2 epochs
    assert(m100.getLong(m100.fieldIndex("d_opt")) == 2000L)
    assert(m100.getDouble(m100.fieldIndex("epochs_needed")) == 2.0)
    assert(m100.getBoolean(m100.fieldIndex("feasible")))
    val m500 = got(500L) // needs 10000 > 4000: not feasible
    assert(!m500.getBoolean(m500.fieldIndex("feasible")))
    assert(m500.getLong(m500.fieldIndex("max_feasible_params")) == 200L)
  }
  test("dataConstrainedPlan: budget <= corpus is 1:1; decay matches " +
      "the closed form; huge repeats saturate at U*(1+Rstar)") {
    import spark.implicits._
    val docs = Seq(600L, 400L).toDF("toks") // corpus = 1000
    val got = Planner.dataConstrainedPlan(docs, col("toks"),
        Seq(500L, 4000L, 10000000L), rStar = 15.39)
      .orderBy("budget_tokens").collect()
    val within = got(0)
    assert(within.getLong(within.fieldIndex("unique_used")) == 500L)
    assert(within.getDouble(within.fieldIndex("repeats")) == 0.0)
    assert(within.getDouble(within.fieldIndex("effective_tokens"))
      == 500.0)
    assert(within.getDouble(within.fieldIndex("utilization")) == 1.0)
    val rep = got(1) // R = 3
    val want = 1000.0 * (1 + 15.39 * (1 - math.exp(-3.0 / 15.39)))
    assert(math.abs(rep.getDouble(rep.fieldIndex("effective_tokens"))
      - want) < 1e-9)
    val sat = got(2) // R = 9999: e^-R/R* ~ 0
    val cap = 1000.0 * (1 + 15.39)
    assert(math.abs(sat.getDouble(sat.fieldIndex("effective_tokens"))
      - cap) < 1e-6)
    assert(sat.getDouble(sat.fieldIndex("utilization")) < 0.002)
  }
}
