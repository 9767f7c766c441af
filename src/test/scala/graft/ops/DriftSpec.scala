package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Distribution drift (Drift.categoricalDrift / topDrifters / tokenDrift). */
class DriftSpec extends SparkTestBase {

  /** Sequential reference for the smoothed divergences. */
  private def ref(ca: Map[String, Long], cb: Map[String, Long],
      alpha: Double): (Double, Double, Double, Double) = {
    val vocab = (ca.keySet ++ cb.keySet).toSeq.sorted
    val na = ca.values.sum.toDouble
    val nb = cb.values.sum.toDouble
    val v = vocab.size
    val terms = vocab.map { w =>
      val pa = (ca.getOrElse(w, 0L) + alpha) / (na + alpha * v)
      val pb = (cb.getOrElse(w, 0L) + alpha) / (nb + alpha * v)
      val m = (pa + pb) / 2.0
      (pa * math.log(pa / pb), pb * math.log(pb / pa),
        0.5 * (pa * math.log(pa / m) + pb * math.log(pb / m)),
        0.5 * math.abs(pa - pb))
    }
    (terms.map(_._1).sum, terms.map(_._2).sum,
      terms.map(_._3).sum, terms.map(_._4).sum)
  }

  private val rowsA = Seq.fill(60)("x") ++ Seq.fill(30)("y") ++ Seq.fill(10)("z")
  private val rowsB = Seq.fill(30)("x") ++ Seq.fill(30)("y") ++ Seq.fill(30)("w")

  test("categoricalDrift matches the sequential smoothed reference") {
    import spark.implicits._
    val df = (rowsA.map(_ -> true) ++ rowsB.map(_ -> false)).toDF("cat", "a")
    val r = Drift.categoricalDrift(df, col("cat"), col("a"), 0.5)
      .collect()(0)
    val ca = rowsA.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cb = rowsB.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (klab, klba, js, tv) = ref(ca, cb, 0.5)
    assert(math.abs(r.getDouble(0) - klab) < 1e-12)
    assert(math.abs(r.getDouble(1) - klba) < 1e-12)
    assert(math.abs(r.getDouble(2) - js) < 1e-12)
    assert(math.abs(r.getDouble(3) - tv) < 1e-12)
    assert(r.getLong(4) == 100L && r.getLong(5) == 90L && r.getLong(6) == 4L)
    // divergence sanity: KL ≥ 0 both ways, JS ≤ ln 2, TV ∈ [0, 1]
    assert(r.getDouble(0) > 0 && r.getDouble(1) > 0)
    assert(r.getDouble(2) > 0 && r.getDouble(2) < math.log(2.0))
    assert(r.getDouble(3) > 0 && r.getDouble(3) < 1.0)
  }

  test("identical slices drift to exactly zero") {
    import spark.implicits._
    val df = (rowsA.map(_ -> true) ++ rowsA.map(_ -> false)).toDF("cat", "a")
    val r = Drift.categoricalDrift(df, col("cat"), col("a")).collect()(0)
    // pa == pb bit-for-bit per category → every term is exactly 0.0
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("bit-identical across partitionings (exact_sum fan-in)") {
    import spark.implicits._
    val rows = rowsA.map(_ -> true) ++ rowsB.map(_ -> false)
    val one = Drift.categoricalDrift(
      rows.toDF("cat", "a").repartition(1), col("cat"), col("a")).collect()(0)
    val many = Drift.categoricalDrift(
      rows.toDF("cat", "a").repartition(13), col("cat"), col("a")).collect()(0)
    (0 until 4).foreach { i =>
      assert(java.lang.Double.doubleToLongBits(one.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(many.getDouble(i)), s"col $i")
    }
  }

  test("one-sided categories get alpha mass; nulls excluded; empty ok") {
    import spark.implicits._
    // 'z' only in A, 'w' only in B — finite divergences, counted in vocab
    val df = (rowsA.map(_ -> true) ++ rowsB.map(_ -> false)).toDF("cat", "a")
    val r = Drift.categoricalDrift(df, col("cat"), col("a")).collect()(0)
    assert(!r.getDouble(0).isInfinite && !r.getDouble(1).isInfinite)
    // null category and null side rows are dropped from counts and totals
    val withNulls = (rowsA.map(s => (s: String, Some(true): Option[Boolean])) ++
      rowsB.map(s => (s, Some(false))) ++
      Seq((null: String, Some(true)), ("x", None))).toDF("cat", "a")
    val rn = Drift.categoricalDrift(withNulls, col("cat"), col("a")).collect()(0)
    assert(rn.getLong(4) == 100L && rn.getLong(5) == 90L && rn.getLong(6) == 4L)
    // empty input: zero totals, zero vocab, null-free zero divergences
    val empty = Seq.empty[(String, Boolean)].toDF("cat", "a")
    val re = Drift.categoricalDrift(empty, col("cat"), col("a")).collect()(0)
    assert(re.isNullAt(0) || re.getDouble(0) == 0.0) // exact_sum of empty → null
    assert(re.getLong(4) == 0L && re.getLong(6) == 0L)
    // alpha = 0 is rejected (one-sided categories would be infinite)
    intercept[IllegalArgumentException] {
      Drift.categoricalDrift(df, col("cat"), col("a"), 0.0).collect()
    }
  }

  test("topDrifters ranks by JS contribution, deterministic ties") {
    import spark.implicits._
    val df = (rowsA.map(_ -> true) ++ rowsB.map(_ -> false)).toDF("cat", "a")
    val top = Drift.topDrifters(df, col("cat"), col("a"), 3)
      .collect().map(r => (r.getInt(r.length - 1), r.getString(0),
        r.getDouble(5)))
    assert(top.map(_._1).toSeq == Seq(1, 2, 3))
    // contributions non-increasing; 'y' (equal counts, both sides) not top
    assert(top.map(_._3).toSeq == top.map(_._3).sortBy(-_).toSeq)
    assert(top.map(_._2).toSet == Set("x", "z", "w"))
    // sums of ALL contributions == the scalar js_div, bit-for-bit paths
    val all = Drift.topDrifters(df, col("cat"), col("a"), 10)
    assert(all.count() == 4L)
  }

  test("numericDrift: PSI == symmetrized KL over hand-binned data") {
    import spark.implicits._
    // A uniform 0..99, B uniform 50..149 — half the mass shifts
    val rows = (0 until 100).map(i => (i.toDouble, true)) ++
      (0 until 100).map(i => (i + 50.0, false))
    val df = rows.toDF("x", "a")
    val r = Drift.numericDrift(df, col("x"), col("a"), bins = 4).collect()(0)
    // reference: combined quantiles at (n-1)q over the sorted multiset
    val all = rows.map(_._1).sorted
    def q(p: Double): Double = {
      val pos = (all.size - 1) * p
      val lo = pos.toInt
      if (lo == all.size - 1) all(lo) else all(lo) + (pos - lo) * (all(lo + 1) - all(lo))
    }
    val edges = Seq(q(0.25), q(0.5), q(0.75))
    def bin(x: Double) = edges.count(x > _)
    val ca = rows.filter(_._2).groupBy(t => bin(t._1)).view.mapValues(_.size.toLong).toMap
    val cb = rows.filterNot(_._2).groupBy(t => bin(t._1)).view.mapValues(_.size.toLong).toMap
    val vocab = (ca.keySet ++ cb.keySet).toSeq.sorted
    val na = 100.0; val nb = 100.0; val v = vocab.size
    val psi = vocab.map { b =>
      val pa = (ca.getOrElse(b, 0L) + 0.5) / (na + 0.5 * v)
      val pb = (cb.getOrElse(b, 0L) + 0.5) / (nb + 0.5 * v)
      pa * math.log(pa / pb) + pb * math.log(pb / pa)
    }.sum
    assert(math.abs(r.getDouble(0) - psi) < 1e-12)
    assert(r.getDouble(0) > 0.5)                  // a real shift registers
    assert(r.getLong(7) == 4L)                    // all four bins observed
    // identical slices → psi exactly 0
    val same = ((0 until 100).map(i => (i.toDouble, true)) ++
      (0 until 100).map(i => (i.toDouble, false))).toDF("x", "a")
    val z = Drift.numericDrift(same, col("x"), col("a"), bins = 5).collect()(0)
    assert(z.getDouble(0) == 0.0)
  }

  test("numericDrift: ties go left, skewed dup mass collapses bins") {
    import spark.implicits._
    // 90% of mass at one value: most quantile edges coincide → few bins
    val rows = Seq.fill(90)(7.0) ++ (1 to 10).map(_.toDouble * 100)
    val df = (rows.map(_ -> true) ++ rows.map(_ -> false)).toDF("x", "a")
    val r = Drift.numericDrift(df, col("x"), col("a"), bins = 10).collect()(0)
    assert(r.getDouble(0) == 0.0)                 // identical sides
    assert(r.getLong(7) < 10L)                    // collapsed edges → fewer observed bins
  }

  test("windowedDrift: per-window vs previous, gaps skipped, zero on repeat") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // day1: 60a/40b; day2: identical mix; day3: 20a/80b; day5 (gap): 50a/50b
    val rows =
      (0 until 60).map(i => (t(1, i % 24), "a")) ++
      (0 until 40).map(i => (t(1, i % 24), "b")) ++
      (0 until 60).map(i => (t(2, i % 24), "a")) ++
      (0 until 40).map(i => (t(2, i % 24), "b")) ++
      (0 until 20).map(i => (t(3, i % 24), "a")) ++
      (0 until 80).map(i => (t(3, i % 24), "b")) ++
      (0 until 50).map(i => (t(5, i % 24), "a")) ++
      (0 until 50).map(i => (t(5, i % 24), "b"))
    val df = rows.toDF("ts", "c")
    val got = Drift.windowedDrift(df, col("ts"), col("c"), "1 day")
      .collect().map(r => r.getTimestamp(0).toString.take(10) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // day2 and day3 have predecessors; day1 has none; day5's predecessor
    // (day4) is missing → skipped
    assert(got.keySet == Set("2024-01-02", "2024-01-03"))
    val (js2, tv2, np2, nc2, v2) = got("2024-01-02")
    assert(js2 == 0.0 && tv2 == 0.0 && np2 == 100L && nc2 == 100L && v2 == 2L)
    // day3 reference vs day2, smoothed over union vocab {a, b}
    val (js3, tv3, _, _, _) = got("2024-01-03")
    def p(n: Long, tot: Long) = (n + 0.5) / (tot + 1.0)
    val ref = Seq((60L, 20L), (40L, 80L)).map { case (na, nb) =>
      val (pa, pb) = (p(na, 100), p(nb, 100))
      val m = (pa + pb) / 2
      (0.5 * (pa * math.log(pa / m) + pb * math.log(pb / m)),
        0.5 * math.abs(pa - pb))
    }
    assert(math.abs(js3 - ref.map(_._1).sum) < 1e-12)
    assert(math.abs(tv3 - ref.map(_._2).sum) < 1e-12)
    // a category vanishing between windows stays finite
    val vanish = ((0 until 50).map(i => (t(7, i % 24), "x")) ++
      (0 until 50).map(i => (t(7, i % 24), "y")) ++
      (0 until 100).map(i => (t(8, i % 24), "x"))).toDF("ts", "c")
    val v8 = Drift.windowedDrift(vanish, col("ts"), col("c"), "1 day")
      .collect()(0)
    assert(!v8.getDouble(1).isInfinite && v8.getLong(5) == 2L)
  }

  test("jsMatrix: pairwise JS vs the two-slice reference, symmetry, zero") {
    import spark.implicits._
    val rows = Seq.fill(60)("g1" -> "x") ++ Seq.fill(40)("g1" -> "y") ++
      Seq.fill(30)("g2" -> "x") ++ Seq.fill(70)("g2" -> "y") ++
      Seq.fill(50)("g3" -> "x") ++ Seq.fill(25)("g3" -> "y") ++
      Seq.fill(25)("g3" -> "z")
    val df = rows.toDF("g", "c")
    val got = Drift.jsMatrix(df, col("c"), col("g"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet ==
      Set(("g1", "g2"), ("g1", "g3"), ("g2", "g3")))
    // reference for one pair, smoothing over the GLOBAL vocab {x,y,z}
    def dist(cs: Map[String, Long], tot: Double) =
      Seq("x", "y", "z").map(w => (cs.getOrElse(w, 0L) + 0.5) / (tot + 1.5))
    val p1 = dist(Map("x" -> 60L, "y" -> 40L), 100)
    val p2 = dist(Map("x" -> 30L, "y" -> 70L), 100)
    val want12 = p1.zip(p2).map { case (pa, pb) =>
      val m = (pa + pb) / 2
      0.5 * (pa * math.log(pa / m) + pb * math.log(pb / m))
    }.sum
    assert(math.abs(got(("g1", "g2")) - want12) < 1e-12)
    // all values in [0, ln 2); identical groups → 0
    got.values.foreach(x => assert(x >= 0 && x < math.log(2.0)))
    val dup = (rows ++ rows.filter(_._1 == "g1").map { case (_, c) => "g4" -> c })
      .toDF("g", "c")
    val z = Drift.jsMatrix(dup, col("c"), col("g"))
      .where(col("group_a") === "g1" && col("group_b") === "g4")
      .collect()(0).getDouble(2)
    assert(z == 0.0)
  }

  test("jsMatrix fails fast when the category column exceeds maxVocab") {
    import spark.implicits._
    // 50 distinct categories against a cap of 10: the misuse signature
    // (unbounded cat column) must throw before the grid materializes.
    val df = (0 until 50).map(i => (s"g${i % 2}", s"cat$i")).toDF("g", "c")
    val ex = intercept[IllegalArgumentException] {
      Drift.jsMatrix(df, col("c"), col("g"), maxVocab = 10)
    }
    assert(ex.getMessage.contains("maxVocab"))
    // the default cap leaves bounded-vocab callers (q129's shape) unchanged
    assert(Drift.jsMatrix(df, col("c"), col("g")).count() == 1)
  }

  test("tokenDrift over the documents fixture: nonzero, parity-split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Drift.tokenDrift(docs, col("text"), col("doc_id") % 2 === 0)
      .collect()(0)
    assert(r.getLong(4) > 0 && r.getLong(5) > 0 && r.getLong(6) > 10)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 0.01) // same generator → tiny JS
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 0.2)
  }

  test("tokenDrift tokenizes \\s+ runs — multi-space text equals single-space") {
    import spark.implicits._
    val spaced = Seq((true, "a  b\tc"), (false, "a\nb  c")).toDF("f", "t")
    val plain = Seq((true, "a b c"), (false, "a b c")).toDF("f", "t")
    val got = Drift.tokenDrift(spaced, col("t"), col("f")).collect()(0)
    val want = Drift.tokenDrift(plain, col("t"), col("f")).collect()(0)
    assert(got == want)
    assert(got.getLong(6) == 3L) // vocab {a,b,c}, no phantom "" token
  }

  test("embeddingOutliers flags the planted far vector, z matches reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // group A: 30 vectors near +e1 with small noise, plus ONE near -e1;
    // group B: tight cluster near e2 (zero spread in dims beyond noise)
    val near = (0 until 30).map { i =>
      (i.toLong, "A", Seq(1.0, rnd.nextDouble() * 0.1, rnd.nextDouble() * 0.1))
    }
    val planted = Seq((99L, "A", Seq(-1.0, 0.0, 0.0)))
    val b = (100 until 110).map { i =>
      (i.toLong, "B", Seq(0.0, 1.0, rnd.nextDouble() * 0.01))
    }
    val df = (near ++ planted ++ b).toDF("id", "g", "v")
    val out = Similarity.embeddingOutliers(df, "id", col("g"), col("v"),
      zThreshold = 3.0).collect()
    val flagged = out.filter(_.getBoolean(4)).map(_.getLong(1)).toSet
    assert(flagged == Set(99L))
    // z of the planted row matches a from-scratch reference
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val all = near ++ planted
    val cent = (0 until 3).map(d => all.map(_._3(d)).sum / all.size)
    val ds = all.map(r => 1.0 - cos(r._3, cent))
    val mu = ds.sum / ds.size
    val sd = math.sqrt(ds.map(x => (x - mu) * (x - mu)).sum / (ds.size - 1))
    val zRef = (ds.last - mu) / sd
    val zGot = out.find(_.getLong(1) == 99L).get.getDouble(3)
    assert(math.abs(zGot - zRef) < 1e-9)
    // single-row group: sd undefined -> z NULL, never flagged
    val single = Seq((1L, "X", Seq(1.0, 0.0))).toDF("id", "g", "v")
    val s1 = Similarity.embeddingOutliers(single, "id", col("g"),
      col("v")).collect()(0)
    assert(s1.isNullAt(3) && !s1.getBoolean(4))
    // partitioning-stable: distances and flags identical; z only to
    // ~1e-15 (the one-pass moment combine is partition-order-sensitive
    // in the last ulp — why the gate rounds z to 6)
    val again = Similarity.embeddingOutliers(df.repartition(7), "id",
      col("g"), col("v"), zThreshold = 3.0).collect()
    val byId = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.sortBy(_.getLong(1))
    byId(out).zip(byId(again)).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0) &&
        x.getLong(1) == y.getLong(1) &&
        x.getDouble(2) == y.getDouble(2) &&
        math.abs(x.getDouble(3) - y.getDouble(3)) < 1e-12 &&
        x.getBoolean(4) == y.getBoolean(4))
    }
  }

  test("ksTest and wasserstein1: hand-worked two-sample distances") {
    import spark.implicits._
    // A = {1, 2}, B = {2, 3}: D = 0.5 (d_num 2 of 4); W1 = 1.0.
    // d_num/w1_num are DECIMAL(38,0) (overflow-proof past ~3e9 rows
    // per side — the Eval.auc convention)
    val df = Seq((1.0, true), (2.0, true), (2.0, false), (3.0, false))
      .toDF("v", "a")
    val ks = Drift.ksTest(df, col("v"), col("a")).collect()(0)
    assert(ks.getLong(ks.fieldIndex("n_a")) == 2L)
    assert(ks.getDecimal(ks.fieldIndex("d_num")).longValueExact == 2L)
    assert(ks.getDouble(ks.fieldIndex("d")) == 0.5)
    val w1 = Drift.wasserstein1(df, col("v"), col("a")).collect()(0)
    assert(w1.getDecimal(w1.fieldIndex("w1_num")).longValueExact == 4L)
    assert(w1.getDouble(w1.fieldIndex("w1")) == 1.0)
    // identical sides: both distances are exactly zero
    val same = Seq((1.0, true), (1.0, false), (5.0, true), (5.0, false))
      .toDF("v", "a")
    assert(Drift.ksTest(same, col("v"), col("a"))
      .collect()(0).getDecimal(2).longValueExact == 0L)
    assert(Drift.wasserstein1(same, col("v"), col("a"))
      .collect()(0).getDecimal(2).longValueExact == 0L)
  }

  test("ksTestFromCounts survives counts whose cross products overflow " +
      "Int64 (the decimal(38,0) widening)") {
    import spark.implicits._
    // 4e9 rows per side across two cells: cA*nB = 2e9 * 4e9 = 8e18 at
    // the midpoint and nA*nB = 1.6e19 > Long.MaxValue at the tail —
    // the pre-widening LONG arithmetic threw under ANSI here
    val big = 4000000000L
    val cells = Seq((1.0, big / 2, big / 4),
      (2.0, big / 2, 3 * big / 4)).toDF("v", "da", "db")
    val ks = Drift.ksTestFromCounts(cells).collect()(0)
    assert(ks.getLong(ks.fieldIndex("n_a")) == big)
    assert(ks.getLong(ks.fieldIndex("n_b")) == big)
    // |cA*nB - cB*nA| at v=1: |2e9*4e9 - 1e9*4e9| = 4e18
    assert(ks.getDecimal(ks.fieldIndex("d_num"))
      .compareTo(new java.math.BigDecimal("4000000000000000000")) == 0)
    assert(ks.getDouble(ks.fieldIndex("d")) == 0.25)
  }
  test("ewmaMonitor: hand-worked baseline, variance, z, and flags") {
    import spark.implicits._
    val df = Seq(("g", 1, 2.0), ("g", 2, 4.0), ("g", 3, 8.0))
      .toDF("g", "t", "x")
    val got = Drift.ewmaMonitor(df, Seq("g"), col("t"), col("x"),
        alpha = 0.5, window = 8, k = 3.0)
      .orderBy("t").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("ewma")))
    assert(!got(0).getBoolean(got(0).fieldIndex("flag")))
    // t2: history [2] -> baseline 2, zero variance, 4 != 2 flags
    assert(got(1).getDouble(got(1).fieldIndex("ewma")) == 2.0)
    assert(got(1).isNullAt(got(1).fieldIndex("z")))
    assert(got(1).getBoolean(got(1).fieldIndex("flag")))
    // t3: history [2,4], weights [1/2, 1] -> ewma 10/3,
    // ewvar = (1/2*(2-10/3)^2 + (4-10/3)^2)/1.5 = 8/9
    val r3 = got(2)
    assert(math.abs(r3.getDouble(r3.fieldIndex("ewma")) - 10.0 / 3) < 1e-14)
    val z = (8.0 - 10.0 / 3) / math.sqrt(8.0 / 9)
    assert(math.abs(r3.getDouble(r3.fieldIndex("z")) - z) < 1e-12)
    assert(r3.getBoolean(r3.fieldIndex("flag"))) // z ~ 4.95 > 3
  }

  test("ewmaMonitor: constant series never flags after the seed; " +
      "window truncates history; partition-invariant") {
    import spark.implicits._
    val const = (1 to 10).map(t => ("g", t, 5.0)).toDF("g", "t", "x")
    val c = Drift.ewmaMonitor(const, Seq("g"), col("t"), col("x"))
      .where(col("flag")).count()
    assert(c == 0L)
    // window=2: at t4 history is [x2, x3] only
    val df = Seq(("g", 1, 100.0), ("g", 2, 4.0), ("g", 3, 4.0),
      ("g", 4, 4.0)).toDF("g", "t", "x")
    val w2 = Drift.ewmaMonitor(df, Seq("g"), col("t"), col("x"),
        alpha = 0.5, window = 2)
      .orderBy("t").collect()
    assert(w2(3).getDouble(w2(3).fieldIndex("ewma")) == 4.0)
    val big = (1 to 200).map(t => ("g" + t % 3, t, (t * 7 % 11).toDouble))
      .toDF("g", "t", "x")
    val one = Drift.ewmaMonitor(big.repartition(1), Seq("g"), col("t"),
      col("x")).orderBy("g", "t").collect().map(_.toString).toSeq
    val many = Drift.ewmaMonitor(big.repartition(7), Seq("g"), col("t"),
      col("x")).orderBy("g", "t").collect().map(_.toString).toSeq
    assert(one == many)
  }

  test("ewmaMonitor: tieCol makes duplicate (group, order) keys " +
      "deterministic across partitionings") {
    import spark.implicits._
    // every order key appears twice; without a tie column the
    // preceding-history frame would be partitioning-dependent
    val big = (1 to 200).map(i =>
      ("g" + i % 3, i / 2, i.toLong, (i * 13 % 17).toDouble))
      .toDF("g", "t", "id", "x")
    def run(parts: Int) = Drift.ewmaMonitor(big.repartition(parts),
        Seq("g"), col("t"), col("x"), tieCol = Some(col("id")))
      .orderBy("g", "t", "id").collect().map(_.toString).toSeq
    assert(run(1) == run(7))
  }
  test("mannWhitney: hand-worked tie-aware example and extremes") {
    import spark.implicits._
    // A={1,3}, B={2,2}: midranks 1, 2.5, 2.5, 4 -> U_A = 2 = E[U], z=0
    val df = Seq((1.0, true), (3.0, true), (2.0, false), (2.0, false))
      .toDF("v", "a")
    val r = Drift.mannWhitney(df, col("v"), col("a")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(r.fieldIndex("u_a")) == 2.0)
    assert(r.getDouble(r.fieldIndex("z")) == 0.0)
    assert(r.getDouble(r.fieldIndex("r_rb")) == 0.0)
    // A strictly above B: U_A = nA*nB, r_rb = 1, z = 2/sqrt(5/3)
    val hi = Seq((5.0, true), (6.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    val h = Drift.mannWhitney(hi, col("v"), col("a")).head()
    assert(h.getDouble(h.fieldIndex("u_a")) == 4.0)
    assert(h.getDouble(h.fieldIndex("r_rb")) == 1.0)
    assert(math.abs(h.getDouble(h.fieldIndex("z"))
      - 2.0 / math.sqrt(5.0 / 3)) < 1e-12)
  }

  test("mannWhitney: empty side -> NULL stats; all-tied -> sigma 0 " +
      "-> NULL z; FromCounts folds partials to the one-shot test") {
    import spark.implicits._
    val oneSide = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    val o = Drift.mannWhitney(oneSide, col("v"), col("a")).head()
    assert(o.isNullAt(o.fieldIndex("u_a")))
    val tied = Seq((7.0, true), (7.0, false), (7.0, true))
      .toDF("v", "a")
    val t = Drift.mannWhitney(tied, col("v"), col("a")).head()
    assert(!t.isNullAt(t.fieldIndex("u_a")))
    assert(t.isNullAt(t.fieldIndex("z")))
    // monoid: two batch partials folded == one-shot
    val all = Seq((1.0, true), (3.0, true), (2.0, false), (2.0, false),
      (5.0, true), (0.5, false))
    val full = Drift.mannWhitney(all.toDF("v", "a"), col("v"), col("a"))
      .head()
    val parts = all.grouped(3).zipWithIndex.map { case (g, i) =>
      g.toDF("v", "a").groupBy(col("v").as("v"))
        .agg(sum(col("a").cast("long")).as("da"),
          sum((!col("a")).cast("long")).as("db"))
    }.reduce(_.unionByName(_))
      .groupBy("v").agg(sum("da").as("da"), sum("db").as("db"))
    val folded = Drift.mannWhitneyFromCounts(parts).head()
    assert(full.toString == folded.toString)
  }

  test("sketch arms agree with their exact twins on a shifted two-sample " +
      "fixture (the q333 receipt at spec grain)") {
    import spark.implicits._
    // side A ~ Uniform-ish lengths, side B = same shape shifted +50:
    // d is large and real, w1 ~ 50, u_frac well off 1/2
    val rows = (0 until 20000).map { i =>
      val base = (i * 2654435761L % 499L).toDouble
      val a = i % 2 == 0
      (if (a) base else base + 50.0, a)
    }
    val df = rows.toDF("v", "is_a")
    val ksE = Drift.ksTest(df, col("v"), col("is_a")).collect()(0)
    val ksS = Drift.ksTestSketch(df, col("v"), col("is_a")).collect()(0)
    assert(ksS.getAs[Long]("n_a") == ksE.getAs[Long]("n_a"))
    assert(ksS.getAs[Long]("n_b") == ksE.getAs[Long]("n_b"))
    val dErr = math.abs(ksS.getAs[Double]("d") - ksE.getAs[Double]("d"))
    assert(dErr < 0.02, s"ks d error $dErr")

    val w1E = Drift.wasserstein1(df, col("v"), col("is_a"))
      .collect()(0).getAs[Double]("w1")
    val w1S = Drift.wasserstein1Sketch(df, col("v"), col("is_a"))
      .collect()(0).getAs[Double]("w1")
    assert(math.abs(w1S - w1E) / w1E < 0.05,
      s"w1 rel error ${math.abs(w1S - w1E) / w1E} (exact $w1E sketch $w1S)")

    val mwE = Drift.mannWhitney(df, col("v"), col("is_a")).collect()(0)
    val mwS = Drift.mannWhitneySketch(df, col("v"), col("is_a"))
      .collect()(0)
    val nab = mwE.getAs[Long]("n_a").toDouble * mwE.getAs[Long]("n_b")
    val ufE = mwE.getAs[Double]("u_a") / nab
    val ufS = mwS.getAs[Double]("u_a") / nab
    assert(math.abs(ufS - ufE) < 0.02,
      s"u_frac error ${math.abs(ufS - ufE)} (exact $ufE sketch $ufS)")
    // rank-biserial is a linear map of u_frac — same bound applies
    assert(math.abs(mwS.getAs[Double]("r_rb")
      - mwE.getAs[Double]("r_rb")) < 0.04)
    // signs/direction agree: B is shifted up, so A is stochastically
    // smaller -> u_frac < 1/2 on both arms
    assert(ufE < 0.5 && ufS < 0.5)
  }

  test("sketch arms: empty side -> NULL stats with the honest counts") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, true)).toDF("v", "is_a")
    val ks = Drift.ksTestSketch(df, col("v"), col("is_a")).collect()(0)
    assert(ks.getAs[Long]("n_a") == 100L && ks.getAs[Long]("n_b") == 0L)
    assert(ks.isNullAt(ks.fieldIndex("d")) &&
      ks.isNullAt(ks.fieldIndex("p_value")))
    val w1 = Drift.wasserstein1Sketch(df, col("v"), col("is_a"))
      .collect()(0)
    assert(w1.isNullAt(w1.fieldIndex("w1")))
    val mw = Drift.mannWhitneySketch(df, col("v"), col("is_a"))
      .collect()(0)
    assert(mw.isNullAt(mw.fieldIndex("u_a")) &&
      mw.isNullAt(mw.fieldIndex("z")))
  }

  test("welchTTest: hand-worked unequal-variance example; NULL guards") {
    import spark.implicits._
    // A = {1, 2, 3} (mean 2, var 1); B = {2, 4, 6, 8} (mean 5, var 20/3)
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (2.0, false),
      (4.0, false), (6.0, false), (8.0, false)).toDF("v", "a")
    val r = Drift.welchTTest(df, col("v"), col("a")).head()
    val (va, vb) = (1.0, 20.0 / 3)
    val se2 = va / 3 + vb / 4
    val t = (2.0 - 5.0) / math.sqrt(se2)
    val dof = se2 * se2 / (math.pow(va / 3, 2) / 2 + math.pow(vb / 4, 2) / 3)
    assert(math.abs(r.getDouble(r.fieldIndex("t")) - t) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("dof")) - dof) < 1e-12)
    val sp2 = (2 * va + 3 * vb) / 5
    val d = -3.0 / math.sqrt(sp2)
    assert(math.abs(r.getDouble(r.fieldIndex("cohen_d")) - d) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("hedges_g"))
      - d * (1 - 3.0 / (4 * 7 - 9))) < 1e-12)
    // one-member side: mean present, var/t NULL
    val tiny = Seq((1.0, true), (2.0, false), (3.0, false)).toDF("v", "a")
    val rt = Drift.welchTTest(tiny, col("v"), col("a")).head()
    assert(rt.getDouble(rt.fieldIndex("mean_a")) == 1.0)
    assert(rt.isNullAt(rt.fieldIndex("var_a")))
    assert(rt.isNullAt(rt.fieldIndex("t")))
  }

  test("cramerVonMises: identical sides give 0 against the shared-cell " +
      "convention; shift registers; partition-invariant") {
    import spark.implicits._
    val same = (1 to 50).flatMap(i => Seq(((i % 7).toDouble, true),
      ((i % 7).toDouble, false))).toDF("v", "a")
    val r0 = Drift.cramerVonMises(same, col("v"), col("a")).head()
    assert(r0.getDouble(r0.fieldIndex("t_stat")) == 0.0)
    // hand-worked: A = {1, 2}, B = {3, 4}: cells (1,2,3,4) with
    // FA = (.5, 1, 1, 1), FB = (0, 0, .5, 1); sum f*(FA-FB)^2 =
    // .25 + 1 + .25 + 0 = 1.5; T = (4/16)*1.5 = .375
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("v", "a")
    val r = Drift.cramerVonMises(df, col("v"), col("a")).head()
    assert(math.abs(r.getDouble(r.fieldIndex("t_stat")) - 0.375) < 1e-12)
    val big = (1 to 500).map(i =>
      ((i * 31 % 97).toDouble + (if (i % 2 == 0) 3.0 else 0.0), i % 2 == 0))
      .toDF("v", "a")
    val p1 = Drift.cramerVonMises(big.repartition(1), col("v"), col("a"))
      .head().toString
    val p9 = Drift.cramerVonMises(big.repartition(9), col("v"), col("a"))
      .head().toString
    assert(p1 == p9)
  }

  test("pairedTTest: hand-worked; constant shift gives NULL t with " +
      "exact mean_diff; NULL rows refused") {
    import spark.implicits._
    // d = (1, 2, 3): mean 2, var 1 -> t = 2/(1/sqrt(3))
    val df = Seq((2.0, 1.0), (5.0, 3.0), (10.0, 7.0)).toDF("x", "y")
    val r = Drift.pairedTTest(df, col("x"), col("y")).head()
    assert(r.getDouble(r.fieldIndex("mean_diff")) == 2.0)
    assert(math.abs(r.getDouble(r.fieldIndex("t"))
      - 2.0 * math.sqrt(3.0)) < 1e-12)
    assert(r.getDouble(r.fieldIndex("dof")) == 2.0)
    // constant shift: sd 0 -> t NULL, mean_diff exact
    val const = (1 to 10).map(i => (i + 5.0, i.toDouble)).toDF("x", "y")
    val rc = Drift.pairedTTest(const, col("x"), col("y")).head()
    assert(rc.getDouble(rc.fieldIndex("mean_diff")) == 5.0)
    assert(rc.isNullAt(rc.fieldIndex("t")))
    // NULL on either side drops the pair
    val withNull = Seq((Some(1.0), Some(2.0)), (None, Some(3.0)),
      (Some(4.0), None)).toDF("x", "y")
    val rn = Drift.pairedTTest(withNull, col("x"), col("y")).head()
    assert(rn.getLong(rn.fieldIndex("n")) == 1L)
  }

  test("kruskalWallis: k=2 reduces to mannWhitney's z^2 (tie-corrected); " +
      "hand-worked 3-group example") {
    import spark.implicits._
    // hand: g1 = {1, 2}, g2 = {3, 4}, g3 = {5, 6} — no ties
    // ranks: 1..6; R = (3, 7, 11); H = 12/(6*7) * (9/2+49/2+121/2) - 21
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Drift.kruskalWallis(df, col("g"), col("v")).head()
    val hWant = 12.0 / 42 * (4.5 + 24.5 + 60.5) - 21
    assert(r.getLong(r.fieldIndex("n")) == 6L)
    assert(r.getLong(r.fieldIndex("k")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("h")) - hWant) < 1e-12)
    assert(r.getDouble(r.fieldIndex("c_ties")) == 1.0)
    // k=2 with ties: H/C == z² from the tie-corrected U test
    val two = (1 to 80).map(i =>
      (((i * 7) % 13).toDouble + (if (i % 2 == 0) 2.0 else 0.0),
        i % 2 == 0)).toDF("v", "a")
    val kw = Drift.kruskalWallis(two,
      when(col("a"), lit("x")).otherwise(lit("y")), col("v")).head()
    val mw = Drift.mannWhitney(two, col("v"), col("a")).head()
    val z = mw.getDouble(mw.fieldIndex("z"))
    assert(math.abs(kw.getDouble(kw.fieldIndex("h_adj")) - z * z) < 1e-9)
  }

  test("kruskalWallis: all-tied values -> NULL h_adj; " +
      "partition-invariant") {
    import spark.implicits._
    val const = (1 to 30).map(i => ("g" + i % 3, 5.0)).toDF("g", "v")
    val rc = Drift.kruskalWallis(const, col("g"), col("v")).head()
    assert(rc.isNullAt(rc.fieldIndex("h_adj")))
    assert(rc.getDouble(rc.fieldIndex("c_ties")) == 0.0)
    val big = (1 to 400).map(i => ("g" + i % 4, (i * 11 % 37).toDouble))
      .toDF("g", "v")
    val a = Drift.kruskalWallis(big.repartition(1), col("g"), col("v"))
      .head().toString
    val b = Drift.kruskalWallis(big.repartition(13), col("g"), col("v"))
      .head().toString
    assert(a == b)
  }

  test("jonckheereTerpstra: hand-worked ordered groups with ties; " +
      "brute pairwise agreement; guards") {
    import spark.implicits._
    // g1={1,2} g2={2,3} g3={4}: U12=3.5 U13=2 U23=2 -> JT=7.5;
    // E=(25-9)/4=4; A=246, C=4*2=8 -> Var=246/72+8/160=3.4666...
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 3.0),
      (3.0, 4.0)).toDF("g", "v")
    val r = Drift.jonckheereTerpstra(df, col("g"), col("v")).head()
    assert(r.getLong(r.fieldIndex("n")) == 5L)
    assert(r.getDouble(r.fieldIndex("jt")) == 7.5)
    assert(r.getDouble(r.fieldIndex("e_jt")) == 4.0)
    val varRef = 246.0 / 72.0 + 8.0 / (8.0 * 5 * 4)
    assert(math.abs(r.getDouble(r.fieldIndex("var_jt")) - varRef) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("z"))
      - 3.5 / math.sqrt(varRef)) < 1e-12)
    // brute pairwise agreement on a bigger mixed fixture
    val data = (1 to 200).map(i =>
      ((i % 4).toDouble, ((i * 7) % 23 + (i % 4) * 2).toDouble))
    val big = data.toDF("g", "v")
    val rb = Drift.jonckheereTerpstra(big, col("g"), col("v")).head()
    val jtRef = (for {
      (gi, vi) <- data; (gj, vj) <- data
      if gi < gj
    } yield if (vi < vj) 1.0 else if (vi == vj) 0.5 else 0.0).sum
    assert(rb.getDouble(rb.fieldIndex("jt")) == jtRef)
    // partition invariance
    val p1 = Drift.jonckheereTerpstra(big.repartition(1), col("g"),
      col("v")).head().toString
    val p13 = Drift.jonckheereTerpstra(big.repartition(13), col("g"),
      col("v")).head().toString
    assert(p1 == p13)
    // guards: one group / too many groups
    intercept[IllegalArgumentException] {
      Drift.jonckheereTerpstra(Seq((1.0, 2.0)).toDF("g", "v"),
        col("g"), col("v"))
    }
    intercept[IllegalArgumentException] {
      Drift.jonckheereTerpstra(
        (1 to 100).map(i => (i.toDouble, 1.0)).toDF("g", "v"),
        col("g"), col("v"), maxGroups = 8)
    }
  }

  test("brunnerMunzel: brute placement-rank agreement with ties; " +
      "all-tied and tiny-side guards") {
    import spark.implicits._
    def brute(as: Seq[Double], bs: Seq[Double])
        : (Double, Double, Double) = {
      val all = as ++ bs
      def midrank(x: Double, in: Seq[Double]): Double =
        in.count(_ < x) + (in.count(_ == x) + 1) / 2.0
      val (n1, n2) = (as.size.toDouble, bs.size.toDouble)
      val rA = as.map(midrank(_, all)); val rB = bs.map(midrank(_, all))
      val (m1, m2) = (rA.sum / n1, rB.sum / n2)
      val xA = as.map(x => midrank(x, all) - midrank(x, as))
      val xB = bs.map(x => midrank(x, all) - midrank(x, bs))
      def svar(xs: Seq[Double]): Double = {
        val m = xs.sum / xs.size
        xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
      }
      val (v1, v2) = (svar(xA), svar(xB))
      val t = n1 * n2 * (m2 - m1) /
        ((n1 + n2) * math.sqrt(n1 * v1 + n2 * v2))
      val pHat = (m2 - (n2 + 1) / 2) / n1
      (pHat, t, n1 * v1 + n2 * v2)
    }
    val as = (1 to 40).map(i => ((i * 13) % 17).toDouble)
    val bs = (1 to 55).map(i => ((i * 7) % 19 + 3).toDouble)
    val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "a")
    // convention: isA marks side A; p_hat = P(A < B) + half-ties
    val r = Drift.brunnerMunzel(df, col("v"), col("a")).head()
    val (pRef, tRef, _) = brute(as, bs)
    assert(math.abs(r.getDouble(r.fieldIndex("p_hat")) - pRef) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("t")) - tRef) < 1e-12)
    // all values tied: pooled variance 0 -> t NULL, p_hat = 1/2
    val tied = (1 to 10).map(i => (5.0, i % 2 == 0)).toDF("v", "a")
    val rt = Drift.brunnerMunzel(tied, col("v"), col("a")).head()
    assert(rt.isNullAt(rt.fieldIndex("t")))
    assert(rt.getDouble(rt.fieldIndex("p_hat")) == 0.5)
    // one-member side: t NULL (needs >= 2 per side)
    val tiny = Seq((1.0, true), (2.0, false), (3.0, false))
      .toDF("v", "a")
    val r1 = Drift.brunnerMunzel(tiny, col("v"), col("a")).head()
    assert(r1.isNullAt(r1.fieldIndex("t")))
  }

  test("msprt: closed-form check; micro-batch moment folds equal the " +
      "one-shot test; constant metric refused NULL") {
    import spark.implicits._
    val xs = (1 to 60).map(i => ("g", ((i * 7) % 13).toDouble + 2.0))
    val df = xs.toDF("g", "v")
    val r = Drift.msprt(df, Seq("g"), col("v"), mu0 = 6.0, tau = 0.5)
      .head()
    val n = xs.size.toDouble
    val mean = xs.map(_._2).sum / n
    val vr = xs.map(x => (x._2 - mean) * (x._2 - mean)).sum / (n - 1)
    val t2 = 0.25
    val ref = 0.5 * math.log(vr / (vr + n * t2)) +
      n * n * t2 * (mean - 6.0) * (mean - 6.0) / (2 * vr * (vr + n * t2))
    assert(math.abs(r.getDouble(r.fieldIndex("log_lambda")) - ref) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("p_always"))
      - math.min(1.0, math.exp(-ref))) < 1e-12)
    // monoid: two-batch folded moments == one-shot
    val (b1, b2) = xs.splitAt(25)
    val parts = Seq(b1, b2).map(s => s.toDF("g", "v")
        .groupBy("g").agg(count(lit(1)).as("n"),
          graft.api.functions.exact_sum(col("v")).as("s"),
          graft.api.functions.exact_sum(col("v") * col("v")).as("q")))
      .reduce(_ union _)
      .groupBy("g").agg(sum("n").as("n"), sum("s").as("s"),
        sum("q").as("q"))
    val folded = Drift.msprtFromMoments(parts, 6.0, 0.5).head()
    assert(folded.getDouble(folded.fieldIndex("log_lambda"))
      == r.getDouble(r.fieldIndex("log_lambda")))
    // constant metric: var 0 -> NULLs
    val c = (1 to 9).map(_ => ("g", 4.0)).toDF("g", "v")
    val rc = Drift.msprt(c, Seq("g"), col("v"), 4.0, 0.5).head()
    assert(rc.isNullAt(rc.fieldIndex("log_lambda")))
    assert(rc.isNullAt(rc.fieldIndex("p_always")))
  }

  test("ksTestWeighted: unit weights reproduce ksTest; weighting " +
      "shifts the verdict; zero-weight side NULL") {
    import spark.implicits._
    val rows = (1 to 80).map(i =>
      (((i * 13) % 23).toDouble + (if (i % 2 == 0) 4.0 else 0.0),
        i % 2 == 0, 1.0))
    val df = rows.toDF("v", "a", "w")
    val rw = Drift.ksTestWeighted(df, col("v"), col("a"), col("w"))
      .head()
    val ru = Drift.ksTest(df, col("v"), col("a")).head()
    // float-grade agreement: the weighted ECDF divides per cell where
    // the unweighted path is an exact integer cross product
    assert(math.abs(rw.getDouble(rw.fieldIndex("d"))
      - ru.getDouble(ru.fieldIndex("d"))) < 1e-12)
    assert(rw.getDouble(rw.fieldIndex("n_eff_a")) == 40.0)
    // upweighting the overlapping A-rows shrinks D
    val shifted = rows.map { case (v, a, _) =>
      (v, a, if (a && v > 10) 5.0 else 1.0) }
    val rs = Drift.ksTestWeighted(shifted.toDF("v", "a", "w"),
      col("v"), col("a"), col("w")).head()
    assert(rs.getDouble(rs.fieldIndex("d"))
      != rw.getDouble(rw.fieldIndex("d")))
    assert(rs.getDouble(rs.fieldIndex("n_eff_a")) < 40.0,
      "unequal weights must shrink the effective sample size")
    // zero-weight side: NULLs
    val z = Seq((1.0, true, 1.0), (2.0, false, 0.0)).toDF("v", "a", "w")
    val rz = Drift.ksTestWeighted(z, col("v"), col("a"), col("w"))
      .head()
    assert(rz.isNullAt(rz.fieldIndex("d")))
  }

  test("mixtureOverlap: hand-worked shares; identical mixes = 1; " +
      "disjoint mixes = 0") {
    import spark.implicits._
    // A: a,a,b,b  B: a,b,b,c -> p=(.5,.5,0), q=(.25,.5,.25)
    // overlap = .25+.5+0 = .75; BC = sqrt(.125)+sqrt(.25)+0
    val df = Seq(("a", true), ("a", true), ("b", true), ("b", true),
      ("a", false), ("b", false), ("b", false), ("c", false))
      .toDF("c", "s")
    val r = Drift.mixtureOverlap(df, col("c"), col("s")).head()
    assert(r.getDouble(r.fieldIndex("overlap")) == 0.75)
    val bc = math.sqrt(0.125) + 0.5
    assert(math.abs(r.getDouble(r.fieldIndex("bhattacharyya")) - bc)
      < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("hellinger"))
      - math.sqrt(1 - bc)) < 1e-12)
    // identical mixes
    val same = Seq(("x", true), ("y", true), ("x", false), ("y", false))
      .toDF("c", "s")
    val rs = Drift.mixtureOverlap(same, col("c"), col("s")).head()
    assert(rs.getDouble(rs.fieldIndex("overlap")) == 1.0)
    assert(math.abs(rs.getDouble(rs.fieldIndex("hellinger"))) < 1e-7)
    // disjoint mixes
    val dis = Seq(("x", true), ("y", false)).toDF("c", "s")
    val rd = Drift.mixtureOverlap(dis, col("c"), col("s")).head()
    assert(rd.getDouble(rd.fieldIndex("overlap")) == 0.0)
    assert(rd.getDouble(rd.fieldIndex("hellinger")) == 1.0)
  }

  test("acf + ljungBox: sequential reference agreement; AR-ish series " +
      "beats white noise; constant series NULL") {
    import spark.implicits._
    def refAcf(xs: Seq[Double], k: Int): Double = {
      val m = xs.sum / xs.size
      val num = (k until xs.size)
        .map(t => (xs(t) - m) * (xs(t - k) - m)).sum
      val den = xs.map(x => (x - m) * (x - m)).sum
      num / den
    }
    // a slowly-varying series (strong lag-1) vs a residue hash
    val smooth = (1 to 60).map(i => ("s", i, (i % 15).toDouble))
    val noisy = (1 to 60).map(i => ("n", i, ((i * 37) % 11).toDouble))
    val df = (smooth ++ noisy).toDF("g", "i", "v")
    val rs = Drift.acf(df, Seq("g"), col("i"), lit(0), col("v"),
        maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(r.fieldIndex("lag")))
        -> r.getDouble(r.fieldIndex("r"))).toMap
    for (k <- 1 to 3) {
      assert(math.abs(rs(("s", k))
        - refAcf(smooth.map(_._3), k)) < 1e-12)
      assert(math.abs(rs(("n", k))
        - refAcf(noisy.map(_._3), k)) < 1e-12)
    }
    assert(rs(("s", 1)) > 0.5 && rs(("s", 1)) > rs(("n", 1)))
    // ljung-box folds the same r's
    val lb = Drift.ljungBox(df, Seq("g"), col("i"), lit(0), col("v"),
        maxLag = 3)
      .collect().map(r => r.getString(0)
        -> r.getDouble(r.fieldIndex("q"))).toMap
    val n = 60.0
    val qRef = n * (n + 2) * (1 to 3)
      .map(k => math.pow(refAcf(smooth.map(_._3), k), 2) / (n - k)).sum
    assert(math.abs(lb("s") - qRef) < 1e-9)
    assert(lb("s") > lb("n"))
    // constant series: NULL r and q
    val c = (1 to 10).map(i => ("c", i, 4.0)).toDF("g", "i", "v")
    val rc = Drift.acf(c, Seq("g"), col("i"), lit(0), col("v"), 2)
      .collect()
    assert(rc.forall(_.isNullAt(rc.head.fieldIndex("r"))))
    val qc = Drift.ljungBox(c, Seq("g"), col("i"), lit(0), col("v"), 2)
      .head()
    assert(qc.isNullAt(qc.fieldIndex("q")))
  }

  test("energyDistance: brute pairwise agreement; identical sides 0; " +
      "shift registers; empty side NULL") {
    import spark.implicits._
    def brute(as: Seq[Double], bs: Seq[Double])
        : (Double, Double, Double) = {
      def s(u: Seq[Double], v: Seq[Double]) =
        (for (x <- u; y <- v) yield math.abs(x - y)).sum
      (s(as, bs) / (as.size.toDouble * bs.size),
        s(as, as) / (as.size.toDouble * as.size),
        s(bs, bs) / (bs.size.toDouble * bs.size))
    }
    val as = (1 to 45).map(i => ((i * 13) % 17).toDouble)
    val bs = (1 to 60).map(i => ((i * 7) % 19 + 2.5).toDouble)
    val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "a")
    val r = Drift.energyDistance(df, col("v"), col("a")).head()
    val (exy, exx, eyy) = brute(as, bs)
    assert(math.abs(r.getDouble(r.fieldIndex("e_xy")) - exy) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("e_xx")) - exx) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("e_yy")) - eyy) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("d2"))
      - (2 * exy - exx - eyy)) < 1e-9)
    assert(r.getDouble(r.fieldIndex("d2")) > 0)
    // identical sides: D2 == 0 exactly (same cells, algebra cancels)
    val same = (1 to 50).flatMap(i =>
      Seq(((i % 7).toDouble, true), ((i % 7).toDouble, false)))
      .toDF("v", "a")
    val rs = Drift.energyDistance(same, col("v"), col("a")).head()
    assert(rs.getDouble(rs.fieldIndex("d2")) == 0.0)
    // empty side: NULLs
    val e = Seq((1.0, true)).toDF("v", "a")
    val re = Drift.energyDistance(e, col("v"), col("a")).head()
    assert(re.isNullAt(re.fieldIndex("d2")))
    // partition invariance
    val p1 = Drift.energyDistance(df.repartition(1), col("v"),
      col("a")).head().toString
    val p13 = Drift.energyDistance(df.repartition(13), col("v"),
      col("a")).head().toString
    assert(p1 == p13)
  }

  test("cusumMonitor: matches the sequential max(0, .) recursion; " +
      "creep alarm fires; reset after excursion") {
    import spark.implicits._
    // series: 10 on-target points, then a +0.8 creep for 10 points
    val xs = (1 to 10).map(_ => 5.0) ++ (1 to 10).map(_ => 5.8)
    val rows = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
    val df = rows.toDF("g", "i", "v")
    val out = Drift.cusumMonitor(df, Seq("g"), col("i"), lit(0),
      col("v"), mu0 = 5.0, k = 0.2, h = 2.0)
      .orderBy("i").collect()
    // sequential reference
    var sp = 0.0; var sn = 0.0
    val ref = xs.map { x =>
      sp = math.max(0, sp + (x - 5.0) - 0.2)
      sn = math.max(0, sn - (x - 5.0) - 0.2)
      (sp, sn)
    }
    out.zip(ref).foreach { case (row, (rp, rn)) =>
      assert(math.abs(row.getDouble(row.fieldIndex("s_pos")) - rp)
        < 1e-12)
      assert(math.abs(row.getDouble(row.fieldIndex("s_neg")) - rn)
        < 1e-12)
    }
    // the creep alarms within 4 points of onset (0.6 net per step)
    val firstFlag = out.indexWhere(_.getBoolean(
      out.head.fieldIndex("flag")))
    assert(firstFlag >= 10 && firstFlag <= 13, s"alarm at $firstFlag")
  }

  test("andersonDarlingK: brute formula agreement with ties; identical " +
      "sides near zero; constant corpus NULL; partition invariance") {
    import spark.implicits._
    // independent sequential reference from the ORIGINAL (non-doubled)
    // Scholz-Stephens tie-adjusted formula
    def brute(data: Seq[(String, Double)]): Double = {
      val groups = data.map(_._1).distinct.sorted
      val n = data.size.toDouble
      val zs = data.map(_._2).distinct.sorted
      var s = 0.0
      for (g <- groups) {
        val ni = data.count(_._1 == g).toDouble
        var acc = 0.0
        for (z <- zs) {
          val hj = data.count(_._2 == z).toDouble
          val bj = data.count(_._2 <= z).toDouble
          val hij = data.count(d => d._1 == g && d._2 == z).toDouble
          val mij = data.count(d => d._1 == g && d._2 <= z).toDouble
          val ba = bj - hj / 2
          val ma = mij - hij / 2
          val den = ba * (n - ba) - n * hj / 4
          if (den > 0)
            acc += hj * math.pow(n * ma - ni * ba, 2) / den
        }
        s += acc / ni
      }
      (n - 1) / (n * n) * s
    }
    val data = (1 to 120).map(i =>
      (s"g${i % 3}", ((i * 7) % 17 + (i % 3) * 2).toDouble))
    val df = data.toDF("g", "v")
    val r = Drift.andersonDarlingK(df, col("g"), col("v")).head()
    val ref = brute(data)
    assert(math.abs(r.getDouble(r.fieldIndex("a2")) - ref) < 1e-9,
      s"got ${r.getDouble(r.fieldIndex("a2"))} ref $ref")
    assert(r.getDouble(r.fieldIndex("e_a2")) == 2.0)
    // identical slices: A2 well below its H0 mean neighborhood's tail
    val same = (1 to 90).map(i => (s"g${i % 3}", ((i / 3) % 10).toDouble))
    val rs = Drift.andersonDarlingK(same.toDF("g", "v"), col("g"),
      col("v")).head()
    assert(math.abs(rs.getDouble(rs.fieldIndex("a2")) - brute(same))
      < 1e-9)
    // constant corpus: single distinct value -> NULL
    val const = Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v")
    val rc = Drift.andersonDarlingK(const, col("g"), col("v")).head()
    assert(rc.isNullAt(rc.fieldIndex("a2")))
    // partition invariance (exact_sum fold)
    val a = Drift.andersonDarlingK(df.repartition(1), col("g"), col("v"))
      .head().toString
    val b = Drift.andersonDarlingK(df.repartition(13), col("g"),
      col("v")).head().toString
    assert(a == b)
  }

  test("moodsMedian: hand-worked 2x2; lower-median convention; " +
      "degenerate corpus") {
    import spark.implicits._
    // g1={1,2} g2={3,4}: lower median = 2; per-group chi2 parts = 2, 2
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 3.0), ("g2", 4.0))
      .toDF("g", "v")
    val rows = Drift.moodsMedian(df, col("g"), col("v"))
      .orderBy("category").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(rows(0).fieldIndex("n_le")) == 2L)
    assert(rows(0).getDouble(rows(0).fieldIndex("chi2_part")) == 2.0)
    assert(rows(1).getDouble(rows(1).fieldIndex("chi2_part")) == 2.0)
    // constant corpus: everything <= median -> expected-GT 0 -> NULL
    val const = Seq(("a", 7.0), ("b", 7.0)).toDF("g", "v")
    val rc = Drift.moodsMedian(const, col("g"), col("v")).collect()
    assert(rc.forall(_.isNullAt(rc.head.fieldIndex("chi2_part"))))
    // empty corpus: empty frame, not a crash
    assert(Drift.moodsMedian(df.where(lit(false)), col("g"), col("v"))
      .count() == 0L)
  }
}
