package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Distributed logistic regression (Classify.logisticFit). */
class LogRegSpec extends SparkTestBase {

  /** Sequential reference: identical math, left-to-right double folds.
    * exact_sum is correctly rounded, so distributed weights may differ
    * from this by ulps — compare with 1e-10. */
  private def refFit(rows: Seq[(Double, Seq[Double])], iters: Int,
      lr: Double): Array[Double] = {
    val d = rows.head._2.size
    val w = new Array[Double](d + 1)
    for (_ <- 0 until iters) {
      val g = new Array[Double](d + 1)
      rows.foreach { case (y, x) =>
        val z = w(0) + (0 until d).map(j => w(j + 1) * x(j)).sum
        val r = 1.0 / (1.0 + math.exp(-z)) - y
        g(0) += r
        (0 until d).foreach(j => g(j + 1) += r * x(j))
      }
      (0 to d).foreach(j => w(j) -= lr * (g(j) / rows.size))
    }
    w
  }

  private val data: Seq[(Double, Seq[Double])] = (0 until 300).map { i =>
    val x1 = (i % 17) / 8.0
    val x2 = (i % 5) / 4.0
    // separable-ish: positive when 2*x1 - x2 > 1.5, plus deterministic noise
    val y = if (2 * x1 - x2 + ((i * 7) % 11 - 5) * 0.1 > 1.5) 1.0 else 0.0
    (y, Seq(x1, x2))
  }

  test("matches the sequential reference to float-fold precision") {
    import spark.implicits._
    val df = data.map { case (y, x) => (y > 0.5, x(0), x(1)) }
      .toDF("label", "x1", "x2")
    val w = Classify.logisticFit(df, Seq(col("x1"), col("x2")),
      col("label"), iterations = 20, lr = 0.5)
    val ref = refFit(data, 20, 0.5)
    assert(w.length == 3)
    w.zip(ref).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-10, s"got ${w.toList} want ${ref.toList}")
    }
    // learned the separating direction: positive on x1, negative on x2
    assert(w(1) > 0 && w(2) < 0)
  }

  test("weights are bit-identical under any partitioning") {
    import spark.implicits._
    val rows = data.map { case (y, x) => (y > 0.5, x(0), x(1)) }
    def fit(parts: Int): List[Long] =
      Classify.logisticFit(
        rows.toDF("label", "x1", "x2").repartition(parts),
        Seq(col("x1"), col("x2")), col("label"), 12, 0.5)
        .map(java.lang.Double.doubleToRawLongBits).toList
    val one = fit(1)
    assert(fit(7) == one)
    assert(fit(32) == one)
  }

  test("scores rank a separable corpus correctly (AUC near 1)") {
    import spark.implicits._
    val df = data.map { case (y, x) => (y > 0.5, x(0), x(1)) }
      .toDF("label", "x1", "x2")
    val w = Classify.logisticFit(df, Seq(col("x1"), col("x2")),
      col("label"), 50, 1.0)
    val scored = df.withColumn("s",
      Classify.logisticScore(Seq(col("x1"), col("x2")), w))
    val auc = Eval.auc(scored, col("s"), col("label")).head().getDouble(3)
    assert(auc > 0.95, s"auc=$auc")
  }

  test("empty input and zero iterations yield zero weights; nulls excluded") {
    import spark.implicits._
    val empty = Seq.empty[(Boolean, Double)].toDF("label", "x1")
    assert(Classify.logisticFit(empty, Seq(col("x1")), col("label"), 5, 0.1)
      .toList == List(0.0, 0.0))

    val df = Seq((true, 1.0), (false, 0.0)).toDF("label", "x1")
    assert(Classify.logisticFit(df, Seq(col("x1")), col("label"), 0, 0.1)
      .toList == List(0.0, 0.0))

    // a NULL feature row must not poison the gradient (excluded up front)
    val withNull = Seq[(java.lang.Boolean, java.lang.Double)](
      (true, 2.0), (false, 0.5), (true, null), (null, 1.0))
      .toDF("label", "x1")
    val clean = Seq((true, 2.0), (false, 0.5)).toDF("label", "x1")
    val a = Classify.logisticFit(withNull, Seq(col("x1")), col("label"), 8, 0.5)
    val b = Classify.logisticFit(clean, Seq(col("x1")), col("label"), 8, 0.5)
    assert(a.toList == b.toList)
  }

  test("hashed-feature text classifier learns a planted token end-to-end") {
    // the q157 composition: hashed unigram bucket histogram (Dsir front
    // end) + logisticFit. Half the docs contain the marker token; the
    // trained model must separate them (every marker doc scores above
    // every clean doc — AUC 1 on the training set is expected here
    // because the marker's bucket is a perfect feature).
    import spark.implicits._
    import graft.expr.TextHash
    val B = 16
    // keep the marker's hash bucket collision-free by construction: only
    // base tokens that land in OTHER buckets (collisions merely blur
    // features — the method tolerates them, but the perfect-separation
    // assertion below shouldn't depend on hash luck)
    def bucketOf(tok: String): Long = {
      val bs = tok.getBytes("UTF-8")
      val h = TextHash.combine(0x27d4eb2f165667c5L,
        TextHash.hashBytes(bs, 0, bs.length, 0L))
      (h >>> 1) % B
    }
    val mb = bucketOf("marker")
    val toks = (0 until 100).map(j => s"tok$j")
      .filter(bucketOf(_) != mb).take(11).toIndexedSeq
    val docs = (0 until 200).map { i =>
      val base = s"${toks(i % 5)} ${toks(5 + i % 3)} ${toks(8 + i % 3)}"
      (i.toLong, if (i % 2 == 0) s"$base marker $base" else s"$base $base",
        i % 2 == 0)
    }.toDF("id", "text", "y")
    val withB = docs
      .withColumn("bs", Dsir.gramBuckets(col("text"), B, bigrams = false))
      .withColumn("n", size(col("bs")))
    val feats = (0 until B).map(b =>
      size(filter(col("bs"), x => x === lit(b.toLong))).cast("double")
        / col("n"))
    val w = Classify.logisticFit(withB, feats, col("y"), 30, 2.0)
    val scored = withB.select(col("y"),
      Classify.logisticScore(feats, w).as("s"))
    val minPos = scored.where(col("y")).agg(min("s")).head().getDouble(0)
    val maxNeg = scored.where(!col("y")).agg(max("s")).head().getDouble(0)
    assert(minPos > maxNeg,
      s"classifier failed to separate: minPos=$minPos maxNeg=$maxNeg")
  }
}
