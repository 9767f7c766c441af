package graft.ops

import graft.SparkTestBase

/** LSH band planning (Dedup.lshBandPlan). */
class DedupLshPlanSpec extends SparkTestBase {

  test("lshBandPlan: divisor grid, curve algebra, log-space choice") {
    val got = Dedup.lshBandPlan(spark, 16, 0.5).collect()
      .map(r => r.getInt(0) -> r).toMap
    // all divisor splits of 16 present
    assert(got.keySet == Set(1, 2, 4, 8, 16))
    // (b=4, r=4): threshold (1/4)^(1/4) ~ 0.707; catch = 1-(1-0.5^4)^4
    val p44 = got(4)
    assert(math.abs(p44.getDouble(2) - math.pow(0.25, 0.25)) < 1e-15)
    assert(math.abs(p44.getDouble(3) -
      (1.0 - math.pow(1.0 - 0.0625, 4))) < 1e-15)
    // exactly one chosen, and it minimizes the log-space distance
    val chosen = got.values.filter(_.getBoolean(4))
    assert(chosen.size == 1)
    val dists = got.values.map(r =>
      math.abs(math.log(r.getDouble(2)) - math.log(0.5))).toSeq
    val cd = math.abs(math.log(chosen.head.getDouble(2)) - math.log(0.5))
    assert(cd == dists.min)
  }
}
