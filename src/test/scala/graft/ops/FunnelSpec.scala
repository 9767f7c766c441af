package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Ordered conversion funnels (Funnel.conversion). */
class FunnelSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("conversion: greedy earliest matching honors step order") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes in order
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-02 00:00:00"),
      (1L, "buy", "2024-01-03 00:00:00"),
      // u2 clicked BEFORE signup: click doesn't count, funnel stops
      (2L, "click", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-02 00:00:00"),
      // u3 signup only
      (3L, "signup", "2024-01-01 00:00:00"),
      // u4 buy before click: reaches click, not buy
      (4L, "signup", "2024-01-01 00:00:00"),
      (4L, "buy", "2024-01-02 00:00:00"),
      (4L, "click", "2024-01-03 00:00:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("u", "t", "time")
    val got = Funnel.conversion(ev, col("u"), col("time"), col("t"),
        Seq("signup", "click", "buy"))
      .orderBy("step").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(4L, 2L, 1L))
    val r2 = got(1)
    assert(r2.getDouble(r2.fieldIndex("rate_vs_first")) == 0.5)
    assert(r2.getDouble(r2.fieldIndex("rate_vs_prev")) == 0.5)
    assert(got(0).isNullAt(got(0).fieldIndex("rate_vs_prev")))
  }

  test("conversion: same-timestamp step events count (>= semantics); " +
      "duplicate events collapse; greedy can't be beaten") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", "2024-01-01 00:00:00"),
      (1L, "b", "2024-01-01 00:00:00"), // same instant: counts
      (2L, "a", "2024-01-01 00:00:00"),
      (2L, "a", "2024-01-01 05:00:00"), // dup collapses to min
      // greedy: first b at 02:00 >= first a, leaves room for c at 03:00
      (2L, "b", "2024-01-01 02:00:00"),
      (2L, "c", "2024-01-01 03:00:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("u", "t", "time")
    val got = Funnel.conversion(ev, col("u"), col("time"), col("t"),
        Seq("a", "b", "c"))
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(2L, 2L, 1L))
  }

  test("conversion: guards — empty steps, duplicate step names") {
    import spark.implicits._
    val ev = Seq((1L, "a", ts("2024-01-01 00:00:00")))
      .toDF("u", "t", "time")
    intercept[IllegalArgumentException] {
      Funnel.conversion(ev, col("u"), col("time"), col("t"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.conversion(ev, col("u"), col("time"), col("t"),
        Seq("a", "a"))
    }
  }
  test("retention: hand-worked weekly cohorts") {
    import spark.implicits._
    // u1 first week 0, returns weeks 1 and 3; u2 first week 0 only;
    // u3 first week 1, returns week 2
    val ev = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-09 10:00:00"),
      (1L, "2024-01-23 10:00:00"),
      (2L, "2024-01-03 10:00:00"),
      (3L, "2024-01-10 10:00:00"), (3L, "2024-01-17 10:00:00")
    ).map { case (u, s) => (u, ts(s)) }.toDF("u", "time")
    val got = Funnel.retention(ev, col("u"), col("time"),
        "2024-01-01", periodDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got((0L, 0L)) == ((2L, 1.0)))
    assert(got((0L, 1L)) == ((1L, 0.5)))
    assert(got((0L, 3L)) == ((1L, 0.5)))
    assert(got((1L, 0L)) == ((1L, 1.0)))
    assert(got((1L, 1L)) == ((1L, 1.0)))
    assert(!got.contains((0L, 2L))) // no activity -> no cell
  }

  test("retention: multiple events in one period count once; " +
      "NULLs refused") {
    import spark.implicits._
    val ev = Seq(
      (java.lang.Long.valueOf(1L), ts("2024-01-02 10:00:00")),
      (java.lang.Long.valueOf(1L), ts("2024-01-03 10:00:00")),
      (null.asInstanceOf[java.lang.Long], ts("2024-01-02 10:00:00"))
    ).toDF("u", "time")
    val got = Funnel.retention(ev, col("u"), col("time"), "2024-01-01")
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 1L)
  }
}
