package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Block-diagonal attention cost receipts (Packing.attentionCost). */
class AttentionCostSpec extends SparkTestBase {

  test("hand-worked block costs over a 16-token frame") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0L, 4L, 10L)),   // blocks 4,6,6 -> 16+36+36 = 88
      (1L, Seq(5L)),            // blocks 5,11 -> 25+121 = 146
      (2L, Seq.empty[Long]))    // one 16-block -> 256
      .toDF("sample_id", "doc_starts")
    val got = Packing.attentionCost(df, seqLen = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n_blocks")),
          r.getLong(r.fieldIndex("cost_blocks")),
          r.getLong(r.fieldIndex("cost_saved")))).toMap
    assert(got(0L) == ((3L, 88L, 168L)))
    assert(got(1L) == ((2L, 146L, 110L)))
    assert(got(2L) == ((1L, 256L, 0L)))
  }

  test("a doc_start at 0 does not double-count the frame edge") {
    import spark.implicits._
    val df = Seq((0L, Seq(0L, 8L))).toDF("sample_id", "doc_starts")
    val r = Packing.attentionCost(df, seqLen = 16).collect()(0)
    assert(r.getLong(r.fieldIndex("n_blocks")) == 2L)
    assert(r.getLong(r.fieldIndex("cost_blocks")) == 128L)
  }

  test("null starts behave as a boundary-free frame") {
    import spark.implicits._
    val df = Seq((0L, null: Seq[Long])).toDF("sample_id", "doc_starts")
    val r = Packing.attentionCost(df, seqLen = 8).collect()(0)
    assert(r.getLong(r.fieldIndex("cost_blocks")) == 64L)
  }
}
