package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "good doc with plenty of words here"), // passes all
    (2L, "x"),                                  // fails min_len
    (3L, "1234567890 1234567890 1234567890"),   // fails digits
    (4L, "short but 99 ok"),                    // passes all
    (5L, "x 123456789012345678901234567890123") // fails min_len AND digits
  ).toDF("doc_id", "text")

  private val rules = Seq(
    "min_len" -> (length(col("text")) >= 10),
    "digits" -> (length(regexp_replace(col("text"), "[^0-9]", ""))
      <= length(col("text")) * 0.5))

  test("sequential funnel counts and standalone overlap diagnostic") {
    val got = Pipeline.filterFunnel(docs, rules)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    // stage 1: 5 in, doc2 fails (doc5 is 35 chars -> passes min_len) -> 4 out
    // stage 2: 4 in, docs 3,5 fail digits -> 2 out; alone: 3,5 -> 2
    assert(got == Seq(
      (1L, "min_len", 5L, 1L, 4L, 1L),
      (2L, "digits", 4L, 2L, 2L, 2L)))
  }

  test("null predicate values count as failures") {
    val withNull = Seq((1L, "ten chars!"), (2L, null)).toDF("doc_id", "text")
    val got = Pipeline.filterFunnel(withNull,
        Seq("min_len" -> (length(col("text")) >= 10)))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "min_len", 2L, 1L, 1L, 1L)))
  }

  test("funnel n_out chain is monotone and matches a direct filter") {
    val direct = docs.where(rules.map(_._2).reduce(_ && _)).count()
    val funnel = Pipeline.filterFunnel(docs, rules).orderBy(desc("stage"))
      .head().getAs[Long]("n_out")
    assert(funnel == direct)
  }
}
