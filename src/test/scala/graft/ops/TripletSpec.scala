package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Semi-hard triplet mining (Similarity.tripletMine / tripletsFrom). */
class TripletSpec extends SparkTestBase {

  // 2-d unit-ish vectors where cosines are easy to reason about:
  // label A around (1,0), label B spread across the quadrant
  private val vecs: Seq[(Long, Seq[Double], String)] = Seq(
    (1L, Seq(1.0, 0.0), "A"),   // anchor under test
    (2L, Seq(0.995, 0.1), "A"), // best positive for 1 (cos ~ .995)
    (3L, Seq(0.9, 0.436), "A"),
    (10L, Seq(0.999, 0.045), "B"), // violating: cos > cos_pos
    (11L, Seq(0.97, 0.243), "B"),  // semi-hard band candidate
    (12L, Seq(0.0, 1.0), "B"))     // easy negative

  private def df = {
    import spark.implicits._
    vecs.toDF("vid", "vec", "lab")
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    math.rint(d / na / nb * 1e6) / 1e6
  }

  test("semi-hard negative preferred over a violating harder one") {
    val rows = Similarity.tripletMine(df, df.where(col("vid") === 1),
        "vid", "vec", "lab", margin = 0.2)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("pos_id")) == 2L)
    // candidate 10 violates (cos .999 > cos_pos), candidate 11 is in the
    // band (cos_pos - .2, cos_pos): semi-hard wins despite lower cosine
    assert(r.getLong(r.fieldIndex("neg_id")) == 11L)
    assert(r.getBoolean(r.fieldIndex("semi_hard")))
    assert(r.getDouble(r.fieldIndex("cos_pos")) ==
      cos(vecs(0)._2, vecs(1)._2))
    assert(r.getDouble(r.fieldIndex("cos_neg")) ==
      cos(vecs(0)._2, vecs(4)._2))
  }

  test("empty band falls back to the hardest negative, flagged") {
    // margin so small the band contains nothing: fallback = max cosine
    // negative = the violating 10
    val r = Similarity.tripletMine(df, df.where(col("vid") === 1),
        "vid", "vec", "lab", margin = 1e-9)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("neg_id")) == 10L)
    assert(!r.getBoolean(r.fieldIndex("semi_hard")))
  }

  test("anchors without a same-label peer emit nothing") {
    import spark.implicits._
    val lone = vecs :+ ((20L, Seq(0.5, 0.5), "C"))
    val d2 = lone.toDF("vid", "vec", "lab")
    val out = Similarity.tripletMine(d2, d2.where(col("vid") === 20),
      "vid", "vec", "lab", margin = 0.2).collect()
    assert(out.isEmpty)
  }

  test("ties break to the lowest candidate id") {
    import spark.implicits._
    // two identical positives 5 and 4 -> pick 4
    val d2 = Seq(
      (1L, Seq(1.0, 0.0), "A"),
      (5L, Seq(0.995, 0.1), "A"),
      (4L, Seq(0.995, 0.1), "A"),
      (9L, Seq(0.9, 0.2), "B")).toDF("vid", "vec", "lab")
    val r = Similarity.tripletMine(d2, d2.where(col("vid") === 1),
      "vid", "vec", "lab", margin = 0.5).collect()(0)
    assert(r.getLong(r.fieldIndex("pos_id")) == 4L)
  }

  test("tripletsFrom accepts an external candidate frame identically") {
    import spark.implicits._
    val scored = Seq(
      (1L, 2L, 0.9, true), (1L, 3L, 0.5, true),
      (1L, 10L, 0.95, false), (1L, 11L, 0.85, false))
      .toDF("anchor_id", "cand_id", "cosine", "same_label")
    val r = Similarity.tripletsFrom(scored, 0.2).collect()(0)
    assert(r.getLong(r.fieldIndex("pos_id")) == 2L)
    assert(r.getLong(r.fieldIndex("neg_id")) == 11L)
    assert(r.getBoolean(r.fieldIndex("semi_hard")))
  }
}
