package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Blocklist matchStats / filterBlocked over the AC automaton. */
class BlocklistSpec extends SparkTestBase {

  private val pats = Seq("spark", "slow", "tab", "table", "a a")

  test("matchStats appends exact overlapping counts; schema preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, "a slow spark table", "keep"),
      (2L, "a a a tab", "keep"),          // "a a" overlaps: 2 hits
      (3L, "nothing here", "keep"),
      (4L, null.asInstanceOf[String], "keep")
    ).toDF("id", "text", "extra")
    val out = Blocklist.matchStats(df, "text", pats)
    assert(out.columns.toSeq ==
      Seq("id", "text", "extra", "n_matches", "n_patterns"))
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(3), r.getInt(4)))).toMap
    // row 1: slow, spark, tab (in table), table → 4 matches, 4 distinct
    assert(m(1L) == ((4L, 4)))
    // row 2: "a a" twice + tab → 3 matches, 2 distinct
    assert(m(2L) == ((3L, 2)))
    assert(m(3L) == ((0L, 0)))
    assert(m(4L) == ((0L, 0)))
  }

  test("filterBlocked drops any-match rows, keeps nulls and clean rows") {
    import spark.implicits._
    val df = Seq((1L, "spark inside"), (2L, "clean"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val kept = Blocklist.filterBlocked(df, "text", pats)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("partition-local: no Exchange in the plan") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"doc $i maybe spark"))
      .toDF("id", "text")
    val out = Blocklist.matchStats(df, "text", pats)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stats agree with per-pattern substring counting on fixture docs") {
    val docs = spark.read.parquet(sf("documents")).limit(50)
    val got = Blocklist.matchStats(docs, "text", pats)
      .select("doc_id", "n_matches").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = docs.select("doc_id", "text").collect().map { r =>
      val t = r.getString(1)
      r.getLong(0) -> pats.map { p =>
        (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong
      }.sum
    }.toMap
    assert(got == ref)
  }
}
