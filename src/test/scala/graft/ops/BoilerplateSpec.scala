package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Corpus-frequency boilerplate removal (Text.removeFrequentParagraphs). */
class BoilerplateSpec extends SparkTestBase {

  private def mk(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("every occurrence of an above-threshold paragraph is dropped") {
    val df = mk(
      (1L, "COOKIE BANNER|intro one|COOKIE BANNER"),
      (2L, "COOKIE BANNER|body two"),
      (3L, "COOKIE BANNER|body three"),
      (4L, "unique text"))
    val out = Text.removeFrequentParagraphs(df, "id", "text", "|", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // banner in 3 distinct docs → boilerplate; doc 1's BOTH copies go
    assert(out(1L) == (("intro one", 1L, 2L)))
    assert(out(2L) == (("body two", 1L, 1L)))
    assert(out(3L) == (("body three", 1L, 1L)))
    assert(out(4L) == (("unique text", 1L, 0L)))
  }

  test("below-threshold repeats survive (unlike dedupParagraphs)") {
    val df = mk(
      (1L, "repeat|repeat|own"),
      (2L, "repeat|other"))
    // 'repeat' is in only 2 docs < minDocs=3 → kept everywhere, even twice
    val out = Text.removeFrequentParagraphs(df, "id", "text", "|", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "repeat|repeat|own")
    assert(out(2L) == "repeat|other")
  }

  test("doc-frequency counts distinct docs, not occurrences") {
    // 'x' appears 3 times but only in 2 docs → below minDocs=3
    val df = mk((1L, "x|x|x"), (2L, "x|y"), (3L, "z"))
    val out = Text.removeFrequentParagraphs(df, "id", "text", "|", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "x|x|x")
  }

  test("all-boilerplate doc survives with empty text; order preserved") {
    val df = mk(
      (1L, "B|A|B"), (2L, "B|mid|A"), (3L, "A|B"), (4L, "B|A"))
    val out = Text.removeFrequentParagraphs(df, "id", "text", "|", minDocs = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // A in 4 docs, B in 4 docs → both boilerplate
    assert(out(1L) == (("", 0L, 3L)))
    assert(out(2L) == (("mid", 1L, 2L)))
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("scoped counting: a paragraph common in one source stays in another") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "promo|a"), (2L, "s1", "promo|b"), (3L, "s1", "promo|c"),
      (4L, "s2", "promo|d"))
      .toDF("id", "src", "text")
    val out = Text.removeFrequentParagraphs(df, "id", "text", "|",
        minDocs = 3, scopeCols = Seq("src"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // promo hits the threshold inside s1 only
    assert(out(1L) == "a" && out(2L) == "b" && out(3L) == "c")
    assert(out(4L) == "promo|d")
  }

  test("null-text rows survive as empty profiles and skip the frequency pool") {
    import spark.implicits._
    val df = Seq((1L, "B|a"), (2L, "B|b"), (3L, "B|c"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Text.removeFrequentParagraphs(df, "id", "text", "|", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(4L) == (("", 0L, 0L)))
    assert(out(1L) == (("a", 1L, 1L)))   // B still hits its threshold of 3
  }

  test("separator with regex metacharacters is treated literally") {
    val df = mk((1L, "a.b"), (2L, "a.c"), (3L, "a.d"))
    val out = Text.removeFrequentParagraphs(df, "id", "text", ".", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "b")
  }
}
