package graft.agg

import graft.SparkTestBase
import graft.core.ExactSum
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Exact reproducible sum: core rounding correctness + Spark-side
  * order/partitioning independence. */
class ExactSumSpec extends SparkTestBase {
  import spark.implicits._

  private def sumOf(xs: Seq[Double]): Double = {
    val s = new ExactSum
    xs.foreach(s.add)
    s.result()
  }

  test("core: exact cancellation — {x_i} ∪ {−x_i} ∪ {v} sums to exactly v") {
    // deterministic wide-exponent values via splitmix-ish mixing
    var st = 0x9e3779b97f4a7c15L
    def nxt(): Long = { st ^= st >>> 30; st *= 0xbf58476d1ce4e5b9L; st ^= st >>> 27; st }
    val xs = (0 until 2000).map { _ =>
      val bits = nxt()
      // clamp exponent field into [1, 2045] to avoid specials
      val e = 1 + (((bits >>> 52) & 0x7ffL) % 2045)
      java.lang.Double.longBitsToDouble((bits & 0x800fffffffffffffL) | (e << 52))
    }
    val v = 1.2345e-17
    // FP sequential summation of this multiset is nowhere near v...
    val seqSum = (xs ++ xs.map(-_) :+ v).sum
    assert(seqSum != v)
    // ...the exact sum is v to the bit, in any order
    assert(sumOf(new scala.util.Random(7).shuffle(xs ++ xs.map(-_) :+ v)) == v)
    assert(sumOf((xs ++ xs.map(-_) :+ v).reverse) == v)
  }

  test("core: correctly rounded vs exact BigDecimal total (half-ulp bound)") {
    var st = 42L
    def nxt(): Long = { st ^= st >>> 30; st *= 0xbf58476d1ce4e5b9L; st ^= st >>> 27; st }
    val xs = (0 until 500).map { _ =>
      val bits = nxt()
      val e = 950 + (((bits >>> 52) & 0x7ffL) % 150) // moderate exponents
      java.lang.Double.longBitsToDouble((bits & 0x800fffffffffffffL) | (e << 52))
    }
    val got = sumOf(xs)
    // java.math.BigDecimal without a MathContext is exact for doubles
    // (scala.math.BigDecimal defaults to 34-digit DECIMAL128 and would
    // round the reference itself — see ExactSumPropSpec)
    def jbd(x: Double) = new java.math.BigDecimal(x)
    val exact = xs.foldLeft(java.math.BigDecimal.ZERO)((a, x) => a.add(jbd(x)))
    val err = exact.subtract(jbd(got)).abs
    val halfUlp = jbd(math.ulp(got)).divide(jbd(2.0))
    val cmp = err.compareTo(halfUlp)
    assert(cmp <= 0, s"not correctly rounded: err=$err halfUlp=$halfUlp")
    if (cmp == 0) // tie must have gone to even
      assert((java.lang.Double.doubleToLongBits(got) & 1L) == 0L)
  }

  test("core: RNE ties, subnormals, overflow boundary") {
    val p53 = 9007199254740992.0 // 2^53
    assert(sumOf(Seq(p53, 1.0)) == p53)               // tie → even
    assert(sumOf(Seq(p53, 1.0, 1.0)) == p53 + 2)      // exact
    assert(sumOf(Seq(p53, 1.5)) == p53 + 2)           // above half-ulp → up
    val tiny = java.lang.Double.MIN_VALUE // 2^-1074
    assert(sumOf(Seq(tiny, tiny)) == tiny * 2)
    assert(sumOf(Seq(tiny, -tiny)) == 0.0)
    assert(1.0 / sumOf(Seq(-0.0)) > 0)                // exact zero → +0.0
    val max = java.lang.Double.MAX_VALUE // ulp(max)/2 ≈ 9.98e291
    assert(sumOf(Seq(max, 1e292)).isPosInfinity)      // past half-ulp → ∞
    assert(sumOf(Seq(max, 9e291)) == max)             // inside half-ulp
    assert(sumOf(Seq(max, max, -max)) == max)         // exact arithmetic, no
                                                      // intermediate overflow
  }

  test("core: IEEE specials") {
    assert(sumOf(Seq(1.0, Double.NaN)).isNaN)
    assert(sumOf(Seq(Double.PositiveInfinity, 1.0)).isPosInfinity)
    assert(sumOf(Seq(Double.NegativeInfinity, -1.0)).isNegInfinity)
    assert(sumOf(Seq(Double.PositiveInfinity, Double.NegativeInfinity)).isNaN)
  }

  test("core: serialize/deserialize/merge round-trip preserves the total") {
    val a = new ExactSum; val b = new ExactSum
    Seq(1e300, 3.5, -2.25e-200).foreach(a.add)
    Seq(-1e300, 0.125).foreach(b.add)
    val m = ExactSum.deserialize(a.serialize())
    m.merge(ExactSum.deserialize(b.serialize()))
    assert(m.result() == sumOf(Seq(1e300, 3.5, -2.25e-200, -1e300, 0.125)))
  }

  test("spark: bit-identical across partitionings; matches core kernel") {
    var st = 99L
    def nxt(): Long = { st ^= st >>> 30; st *= 0xbf58476d1ce4e5b9L; st ^= st >>> 27; st }
    val xs = (0 until 5000).map { _ =>
      val bits = nxt()
      val e = 800 + (((bits >>> 52) & 0x7ffL) % 400)
      java.lang.Double.longBitsToDouble((bits & 0x800fffffffffffffL) | (e << 52))
    }
    val expect = sumOf(xs)
    val results = Seq(1, 3, 32).map { n =>
      xs.toDF("x").repartition(n)
        .agg(gf.exact_sum($"x").as("s")).collect()(0).getDouble(0)
    }
    assert(results.forall(_ == expect), s"got $results, want $expect")
    // and via SQL registration
    xs.toDF("x").createOrReplaceTempView("exact_sum_t")
    val viaSql = spark.sql("SELECT exact_sum(x) AS s FROM exact_sum_t")
      .collect()(0).getDouble(0)
    assert(viaSql == expect)
  }

  test("spark: empty and all-null groups yield null; nulls are skipped") {
    val df = Seq[(Int, Option[Double])]((0, None), (0, None),
      (1, Some(2.0)), (1, None)).toDF("g", "x")
    val got = df.groupBy("g").agg(gf.exact_sum($"x").as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(0 -> None, 1 -> Some(2.0)))
  }

  test("vec_exact_sum: per-component bits == d separate exact_sums") {
    val df = (0 until 10000).map { i =>
      (i % 7, 1e15 + i * 1.1, -1e15 + i * 0.3, (i % 13) / 7.0)
    }.toDF("g", "a", "b", "c")
    val vec = df.groupBy("g")
      .agg(gf.vec_exact_sum(array($"a", $"b", $"c")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val sep = df.groupBy("g")
      .agg(gf.exact_sum($"a"), gf.exact_sum($"b"), gf.exact_sum($"c"))
      .collect().map(r => r.getInt(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(vec.keySet == sep.keySet)
    vec.foreach { case (g, v) =>
      v.zip(sep(g)).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y), s"group $g: $x vs $y") }
    }
  }

  test("vec_exact_sum: bit-identical across partitionings; null rows skipped") {
    val rows = (0 until 5000).map(i => Seq(i * 0.7, 1e12 - i * 1.3))
    def run(parts: Int): Seq[Long] =
      rows.toDF("v").repartition(parts)
        .agg(gf.vec_exact_sum($"v")).head().getSeq[Double](0)
        .map(java.lang.Double.doubleToRawLongBits)
    assert(run(1) == run(13))
    val withNull = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0)))
      .toDF("v")
    assert(withNull.agg(gf.vec_exact_sum($"v")).head().getSeq[Double](0)
      == Seq(4.0, 6.0))
  }

  test("vec_exact_sum: empty input null, ragged widths fail, SQL surface") {
    val empty = Seq.empty[Seq[Double]].toDF("v")
    assert(empty.agg(gf.vec_exact_sum($"v")).head().isNullAt(0))
    val ragged = Seq(Seq(1.0), Seq(1.0, 2.0)).toDF("v")
    val e = intercept[Exception](
      ragged.agg(gf.vec_exact_sum($"v")).head())
    assert(e.getMessage.contains("ragged") ||
      (e.getCause != null && e.getCause.getMessage.contains("ragged")))
    val viaSql = spark.sql(
      "SELECT vec_exact_sum(v) FROM VALUES (array(1.0d, 2.0d)), " +
        "(array(3.0d, 4.0d)) AS t(v)").head().getSeq[Double](0)
    assert(viaSql == Seq(4.0, 6.0))
  }
}
