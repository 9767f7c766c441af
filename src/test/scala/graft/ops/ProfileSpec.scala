package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** One-pass multi-sketch column profiling (Profile.profile). */
class ProfileSpec extends SparkTestBase {

  private def run(parts: Int = 4) = {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (3L, Some("a"), None),
      (4L, None, Some(20.0)),
      (5L, Some("a"), Some(30.0))
    ).toDF("id", "cat", "v").repartition(parts)
    Profile.profile(df).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getString(6), r.getLong(7)))
    }.toMap
  }

  test("counts, nulls, distincts, min/max, dominant value — hand-checked") {
    val p = run()
    assert(p("id") == ((5L, 5L, 5L, "1", "5", "1", 1L)))
    assert(p("cat") == ((5L, 4L, 2L, "a", "b", "a", 3L)))
    // doubles render with the decimal point; ties ("10.0"/"30.0" at 1)
    // resolve by value asc after the dominant "20.0"
    assert(p("v") == ((5L, 4L, 3L, "10.0", "30.0", "20.0", 2L)))
  }

  test("deterministic across partitionings") {
    assert(run(1) == run(7))
  }

  test("dominant-value tie resolves by value asc") {
    import spark.implicits._
    val df = Seq("x", "y", "x", "y", "z").toDF("c")
    val p = Profile.profile(df).collect().head
    assert(p.getString(6) == "x" && p.getLong(7) == 2L)
  }

  test("one aggregation job: a single Aggregate pair in the plan") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"v${i % 7}", i * 0.5))
      .toDF("a", "b", "c")
    val out = Profile.profile(df)
    out.collect()
    // ONE logical Aggregate feeds every column's sketches (the physical
    // plan is its partial+final split; AQE prints that tree twice, so
    // count logical nodes, not plan-string lines)
    val nAggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggs == 1, out.queryExecution.optimizedPlan.toString)
  }

  test("all-null column and empty table profile without ANSI errors") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("id", "dead")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val dead = p("dead")
    assert(dead.getLong(1) == 2L && dead.getLong(2) == 0L &&
      dead.getLong(3) == 0L)
    assert(dead.isNullAt(4) && dead.isNullAt(5))      // min/max
    assert(dead.isNullAt(6) && dead.isNullAt(7))      // top value/count
    val empty = Profile.profile(
      Seq.empty[(Long, String)].toDF("a", "b")).collect()
    assert(empty.length == 2 && empty.forall(r => r.getLong(1) == 0L))
  }

  test("numeric columns report numeric extremes, not lexicographic") {
    import spark.implicits._
    val df = Seq(1.0, 9.0, 10.0, 50.0).toDF("x")
    val p = Profile.profile(df).collect().head
    assert(p.getString(4) == "1.0" && p.getString(5) == "50.0")
  }

  test("wide ties stay deterministic (full counter list sorted, not a slice)") {
    import spark.implicits._
    val vals = (0 until 30).map(i => f"t$i%02d")   // 30-way tie at count 1
    def top(parts: Int): (String, Long) = {
      val p = Profile.profile(vals.toDF("c").repartition(parts)).collect().head
      (p.getString(6), p.getLong(7))
    }
    assert(top(1) == (("t00", 1L)))
    assert(top(7) == (("t00", 1L)))
  }

  test("matches exact recomputation on fixture lineitem") {
    val li = spark.read.parquet(sf("lineitem"))
    val p = Profile.profile(li, Seq("l_returnflag", "l_quantity"),
        topCapacity = 4096)
      .collect().map { r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6), r.getLong(7)))
      }.toMap
    val n = li.count()
    val rfTop = li.groupBy("l_returnflag").count()
      .orderBy(desc("count"), asc("l_returnflag")).head()
    val rfDistinct = li.select("l_returnflag").distinct().count()
    assert(p("l_returnflag") ==
      ((n, n, rfDistinct, rfTop.getString(0), rfTop.getLong(1))))
    val qDistinct = li.select("l_quantity").distinct().count()
    assert(p("l_quantity")._3 == qDistinct)
  }
}
