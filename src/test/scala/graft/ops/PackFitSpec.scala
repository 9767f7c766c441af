package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Whole-document harmonic-fit packing (Packing.packFitWhole): the
  * no-straddler contract, class geometry, tail fill bound, determinism. */
class PackFitSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-corpus: lengths spread over all classes
  private def corpus(n: Int, budget: Int) =
    (0 until n).map { i =>
      (i.toLong, 1 + (i * 37 + 11) % (budget + budget / 4))
    }.toDF("id", "len")

  test("no bin exceeds the budget except oversize singles") {
    val budget = 100L
    val df = corpus(500, 100)
    val bins = Packing.packFitWhole(df, "id", "len", budget)
      .groupBy("bin").agg(sum(col("len")).as("t"),
        count(lit(1)).as("docs"), max(col("len")).as("mx"))
      .collect()
    bins.foreach { r =>
      val t = r.getAs[Long]("t")
      if (t > budget) // only an oversize doc alone may exceed
        assert(r.getAs[Long]("docs") == 1 && r.getAs[Int]("mx") > budget,
          s"overfull bin with ${r.getAs[Long]("docs")} docs, t=$t")
    }
  }

  test("harmonic classes pack exactly k docs per full bin") {
    val budget = 100L
    // 7 docs of len 60 → class 1 (one per bin) → 7 bins
    val big = (0 until 7).map(i => (i.toLong, 60)).toDF("id", "len")
    val binsBig = Packing.packFitWhole(big, "id", "len", budget)
      .select("bin").distinct().count()
    assert(binsBig == 7)
    // 7 docs of len 40 → class 2 (two per bin) → 4 bins
    val mid = (0 until 7).map(i => (i.toLong, 40)).toDF("id", "len")
    val binsMid = Packing.packFitWhole(mid, "id", "len", budget)
      .select("bin").distinct().count()
    assert(binsMid == 4)
  }

  test("oversize docs get one bin each") {
    val df = Seq((1L, 150), (2L, 250), (3L, 10)).toDF("id", "len")
    val got = Packing.packFitWhole(df, "id", "len", 100L)
      .select("id", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) != got(2L))
    assert(Set(got(1L), got(2L)).forall(_ < (1L << 40)),
      "oversize docs must land in class 0")
  }

  test("tail bins fill to at least capacity minus one tail length") {
    val budget = 128L
    val capTail = budget - budget / 8 // 112
    // all docs ≤ budget/8 = 16 → tail class only
    val df = (0 until 200).map(i => (i.toLong, 1 + (i * 7) % 16))
      .toDF("id", "len")
    val bins = Packing.packFitWhole(df, "id", "len", budget)
      .groupBy("bin").agg(sum(col("len")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("t")).sortBy(_._1)
    // every bin fits; every bin except the last is ≥ capTail − max len
    bins.foreach { case (_, t) => assert(t <= budget) }
    bins.dropRight(1).foreach { case (b, t) =>
      assert(t >= capTail - 16, s"undersized tail bin $b: $t")
    }
  }

  test("deterministic under repartitioning") {
    val budget = 100L
    val df = corpus(300, 100)
    val a = Packing.packFitWhole(df, "id", "len", budget)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toList
    val b = Packing.packFitWhole(df.repartition(7), "id", "len", budget)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toList
    assert(a == b)
  }

  test("small-window tier ≡ distributed per-class tier") {
    val df = corpus(400, 100)
    val small = Packing.packFitWhole(df, "id", "len", 100L)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toList
    val big = Packing.packFitWhole(df, "id", "len", 100L,
        smallInputRows = 0L) // force the distributed tier
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toList
    assert(small == big)
  }

  test("stats receipt: oversize counted, gain vs naive baseline") {
    val df = Seq((1L, 150), (2L, 50), (3L, 50), (4L, 10), (5L, 10))
      .toDF("id", "len")
    val r = Packing.packingStatsFit(df, "id", "len", 100L).collect().head
    assert(r.getAs[Long]("n_oversize_docs") == 1)
    assert(r.getAs[Long]("n_docs") == 5)
    // naive: ceil(150/100)=2 + 1+1+1+1 = 6
    assert(r.getAs[Long]("naive_seqs") == 6)
  }
}
