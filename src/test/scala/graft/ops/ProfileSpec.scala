package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** One-pass multi-sketch column profiling (Profile.profile). */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("dataCard: every metric matches hand arithmetic on a tiny corpus") {
    // 4 docs, one exact dup, 2 sources, 2 langs
    val docs = Seq(
      (1L, "a b c", "s1", "en"), (2L, "a b c", "s1", "en"),
      (3L, "d e", "s2", "fr"), (4L, "a a a b", "s1", "en"))
      .toDF("id", "text", "src", "lang")
    val card = Profile.dataCard(docs, "id", "text", "src", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") == 4.0)
    assert(card("n_tokens") == 12.0)
    assert(card("n_chars") == (5 + 5 + 3 + 7).toDouble)
    assert(card("n_sources") == 2.0 && card("n_langs") == 2.0)
    assert(card("exact_dup_docs") == 1.0)
    assert(card("exact_dup_rate") == 0.25)
    assert(card("avg_doc_tokens") == 3.0)
    assert(card("top_source_share") == 0.75)
    assert(card("top_lang_share") == 0.75)
    assert(card.contains("zipf_slope") && card.contains("zipf_r2"))
    assert(!card.contains("avg_deflate_ratio"))
    // optional compressibility row appears on request, in (0, 1+]
    val withZ = Profile.dataCard(docs, "id", "text", "src", "lang",
      includeCompressibility = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(withZ("avg_deflate_ratio") > 0.0)
  }


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

  /** Sequential Spearman reference: tie-averaged ranks + Pearson. */
  private def refSpearman(data: Seq[(Double, Double)]): Option[Double] = {
    if (data.size < 2) return None
    def ranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val below = sorted.count(_ < x)
        val eq = sorted.count(_ == x)
        below + (eq + 1) / 2.0
      }
    }
    val rx = ranks(data.map(_._1)); val ry = ranks(data.map(_._2))
    val n = data.size
    val sx = rx.sum; val sy = ry.sum
    val num = n * rx.zip(ry).map { case (a, b) => a * b }.sum - sx * sy
    val dx = n * rx.map(r => r * r).sum - sx * sx
    val dy = n * ry.map(r => r * r).sum - sy * sy
    if (dx <= 0 || dy <= 0) None
    else Some(num / math.sqrt(dx) / math.sqrt(dy))
  }

  test("spearman: monotone nonlinear relation scores 1.0; reversed -1.0") {
    import spark.implicits._
    val xs = (1 to 40).map(_.toDouble)
    val up = xs.map(x => (x, x * x * x)).toDF("x", "y")
    val r = Profile.spearman(up, col("x"), col("y")).head()
    assert(r.getLong(0) == 40L && math.abs(r.getDouble(1) - 1.0) < 1e-12)
    val down = xs.map(x => (x, -math.log(x))).toDF("x", "y")
    assert(math.abs(Profile.spearman(down, col("x"), col("y"))
      .head().getDouble(1) + 1.0) < 1e-12)
  }

  test("spearman: ties + noise match the sequential reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val data = (0 until 300).map { _ =>
      (rnd.nextInt(12).toDouble, rnd.nextInt(9) - rnd.nextInt(4) * 0.5) }
    val want = refSpearman(data).get
    val got = Profile.spearman(data.toDF("x", "y"), col("x"), col("y"))
      .head().getDouble(1)
    assert(math.abs(got - want) < 1e-12, s"$got != $want")
  }

  test("spearman: partitioning-invariant to the bit; edge cases NULL") {
    import spark.implicits._
    val data = (0 until 200).map(i =>
      ((i % 17).toDouble, math.sin(i.toDouble)))
    val r1 = Profile.spearman(data.toDF("x", "y").repartition(1),
      col("x"), col("y")).head().getDouble(1)
    val r7 = Profile.spearman(data.toDF("x", "y").repartition(7),
      col("x"), col("y")).head().getDouble(1)
    assert(java.lang.Double.doubleToRawLongBits(r1) ==
      java.lang.Double.doubleToRawLongBits(r7))
    // constant column -> NULL rho; NaN/NULL rows excluded listwise
    val const = Seq((1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    assert(Profile.spearman(const, col("x"), col("y")).head().isNullAt(1))
    val withNulls = Seq((Some(1.0), Some(2.0)), (None, Some(1.0)),
      (Some(Double.NaN), Some(0.0)), (Some(3.0), Some(4.0)))
      .toDF("x", "y")
    assert(Profile.spearman(withNulls, col("x"), col("y"))
      .head().getLong(0) == 2L)
  }

  test("transitionMatrix: within-entity counts, conditional rows sum 1") {
    import spark.implicits._
    // user 1: a b a b ; user 2: a b — transitions never cross users
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (1L, 4L, "b"), (2L, 1L, "a"), (2L, 2L, "b"))
      .toDF("u", "t", "s")
    val got = Profile.transitionMatrix(df, Seq("u"), col("t"),
        col("t"), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b")) == (3L, 1.0))
    assert(got(("b", "a")) == (1L, 1.0))
    assert(got.size == 2) // no (b, a) across the user boundary beyond u1
  }

  test("clusterAgreement: identity scores 1, independence near 0") {
    import spark.implicits._
    val dep = (Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y")))
      .toDF("a", "b")
    val d = Profile.clusterAgreement(dep, col("a"), col("b"))
      .collect()(0)
    assert(d.getLong(0) == 10L)
    assert(d.getLong(d.fieldIndex("sum_comb")) == 20L) // 2*C(5,2)
    assert(math.abs(d.getDouble(d.fieldIndex("ari")) - 1.0) < 1e-12)
    assert(math.abs(d.getDouble(d.fieldIndex("nmi")) - 1.0) < 1e-12)
    // balanced independent 2x2: ARI slightly negative, NMI ~ 0
    val ind = (for {a <- Seq("x", "y"); b <- Seq("u", "v");
      _ <- 0 until 5} yield (a, b)).toDF("a", "b")
    val i = Profile.clusterAgreement(ind, col("a"), col("b"))
      .collect()(0)
    assert(i.getLong(i.fieldIndex("sum_comb")) == 40L)
    assert(i.getLong(i.fieldIndex("sum_a")) == 90L)
    assert(math.abs(i.getDouble(i.fieldIndex("ari"))) < 0.1)
    assert(math.abs(i.getDouble(i.fieldIndex("nmi"))) < 1e-12)
  }

  test("independence: exact zero under independence, max under identity") {
    import spark.implicits._
    // balanced 2x2 independent: every cell 5 -> chi2 = 0, mi = 0
    val ind = (for {a <- Seq("x", "y"); b <- Seq("u", "v");
      _ <- 0 until 5} yield (a, b)).toDF("a", "b")
    val i = Profile.independence(ind, col("a"), col("b")).collect()(0)
    assert(i.getLong(0) == 20L && i.getLong(1) == 4L && i.getLong(2) == 1L)
    assert(i.getDouble(3) == 0.0) // chi2
    assert(i.getDouble(4) == 0.0) // cramers v
    assert(math.abs(i.getDouble(5)) < 1e-15) // mi
    // perfectly dependent 2x2: a == b -> V = 1, mi = ln 2
    val dep = (Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y")))
      .toDF("a", "b")
    val d = Profile.independence(dep, col("a"), col("b")).collect()(0)
    assert(math.abs(d.getDouble(4) - 1.0) < 1e-12)
    assert(math.abs(d.getDouble(5) - math.log(2.0)) < 1e-12)
  }
  test("benfordAudit: string extraction, zero-fill, chi2 parts") {
    import spark.implicits._
    // 1000 and 905 classify by first char; 0, -5, null dropped
    val df = Seq[java.lang.Long](1L, 1L, 2L, 905L, 1000L, 0L, -5L, null)
      .toDF("v")
    val got = Profile.benfordAudit(df, col("v"))
      .orderBy("digit").collect()
    assert(got.length == 9)
    val n = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(n(1) == 3L && n(2) == 1L && n(9) == 1L && n(3) == 0L)
    val r1 = got(0)
    assert(r1.getDouble(r1.fieldIndex("share")) == 0.6)
    assert(math.abs(r1.getDouble(r1.fieldIndex("expected"))
      - math.log10(2.0)) < 1e-15)
    // chi2_part = (n - t*e)^2 / (t*e) with t = 5
    val e1 = math.log10(2.0)
    assert(math.abs(r1.getDouble(r1.fieldIndex("chi2_part"))
      - math.pow(3.0 - 5 * e1, 2) / (5 * e1)) < 1e-12)
  }

  test("benfordAudit: empty input yields nine zero rows with NULL stats") {
    import spark.implicits._
    val got = Profile.benfordAudit(Seq(-1L).toDF("v"), col("v"))
      .orderBy("digit").collect()
    assert(got.length == 9)
    assert(got.forall(_.getLong(1) == 0L))
    assert(got.forall(_.isNullAt(2)))
  }

  test("anovaF: hand-worked three-group example; guards") {
    import spark.implicits._
    // g1 = {1,2,3}, g2 = {2,3,4}, g3 = {5,6,7}: grand mean 33/9
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 3.0), ("b", 4.0), ("c", 5.0), ("c", 6.0), ("c", 7.0))
      .toDF("g", "v")
    val r = Profile.anovaF(df, col("g"), col("v")).head()
    val gm = 33.0 / 9
    val ssb = 3 * (math.pow(2 - gm, 2) + math.pow(3 - gm, 2)
      + math.pow(6 - gm, 2))
    val ssw = 3 * 2.0 // each group has variance 1, (n-1)*var = 2
    assert(r.getLong(r.fieldIndex("n")) == 9L)
    assert(r.getLong(r.fieldIndex("k")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("ss_between")) - ssb) < 1e-10)
    assert(math.abs(r.getDouble(r.fieldIndex("ss_within")) - ssw) < 1e-10)
    assert(math.abs(r.getDouble(r.fieldIndex("f"))
      - (ssb / 2) / (ssw / 6)) < 1e-10)
    assert(math.abs(r.getDouble(r.fieldIndex("eta2"))
      - ssb / (ssb + ssw)) < 1e-12)
    // single slice: F NULL; constant slices: SS_within 0 -> F NULL
    val one = Profile.anovaF(df.where(col("g") === "a"), col("g"),
      col("v")).head()
    assert(one.isNullAt(one.fieldIndex("f")))
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val rc = Profile.anovaF(const, col("g"), col("v")).head()
    assert(rc.isNullAt(rc.fieldIndex("f")))
    assert(rc.getDouble(rc.fieldIndex("eta2")) == 1.0)
  }

  test("leveneTest: Brown-Forsythe flags unequal spread with equal " +
      "means; equal spreads give W ~ 0; mean variant") {
    import spark.implicits._
    // similar centers, spreads 100x apart (multi-level within-group
    // deviations so SS_within stays > 0)
    val df = (Seq.tabulate(20)(i => ("tight", 10.0 + (i % 5) * 0.1))
      ++ Seq.tabulate(20)(i => ("wide", 10.0 + (i % 5) * 10.0)))
      .toDF("g", "v")
    val r = Profile.leveneTest(df, col("g"), col("v")).head()
    assert(r.getLong(r.fieldIndex("k")) == 2L)
    assert(r.getDouble(r.fieldIndex("w")) > 10.0)
    // identical multisets per group: |x - med| identical -> W = 0
    val same = (1 to 60).map(i => ("g" + i % 3, (i % 20).toDouble))
      .toDF("g", "v")
    val rs = Profile.leveneTest(same, col("g"), col("v")).head()
    assert(math.abs(rs.getDouble(rs.fieldIndex("w"))) < 1e-9)
    // mean-centered variant runs and agrees on the symmetric fixture
    val rm = Profile.leveneTest(df, col("g"), col("v"), "mean").head()
    assert(rm.getDouble(rm.fieldIndex("w")) > 10.0)
    intercept[IllegalArgumentException] {
      Profile.leveneTest(df, col("g"), col("v"), "mode")
    }
  }

  test("chiSquareGof: hand-worked parts, zero-fill, stray category " +
      "fails fast, share normalization") {
    import spark.implicits._
    val df = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("cat")
    // ratios 6/3/1 normalize to .6/.3/.1; N=110
    val got = Profile.chiSquareGof(df, col("cat"),
        Seq("a" -> 6.0, "b" -> 3.0, "c" -> 1.0, "d" -> 0.1))
      .orderBy("category").collect()
    assert(got.length == 4)
    val a = got(0)
    val expA = 110.0 * (6.0 / 10.1)
    assert(math.abs(a.getDouble(a.fieldIndex("expected_n")) - expA) < 1e-9)
    assert(math.abs(a.getDouble(a.fieldIndex("chi2_part"))
      - math.pow(60 - expA, 2) / expA) < 1e-9)
    val d = got(3) // declared but unobserved: zero-filled
    assert(d.getLong(d.fieldIndex("n_obs")) == 0L)
    assert(d.getDouble(d.fieldIndex("chi2_part")) > 0.0)
    intercept[IllegalArgumentException] {
      Profile.chiSquareGof(df, col("cat"), Seq("a" -> 1.0, "b" -> 1.0))
        .collect()
    }
  }

  test("anovaF: partition-invariant; equal group means give F ~ 0") {
    import spark.implicits._
    val big = (1 to 600).map(i => ("g" + i % 4, (i * 17 % 29).toDouble))
      .toDF("g", "v")
    val a = Profile.anovaF(big.repartition(1), col("g"), col("v"))
      .head().toString
    val b = Profile.anovaF(big.repartition(11), col("g"), col("v"))
      .head().toString
    assert(a == b)
    // shifted copies of one multiset across groups: all means equal
    val flat = (1 to 300).map(i => ("g" + i % 3, (i % 100).toDouble))
      .toDF("g", "v")
    val rf = Profile.anovaF(flat, col("g"), col("v")).head()
    assert(math.abs(rf.getDouble(rf.fieldIndex("f"))) < 1e-9)
  }

  test("kendallTau: brute pairwise agreement with ties; perfect and " +
      "reversed orders; constant-axis guard; cell guard") {
    import spark.implicits._
    def brute(pts: Seq[(Double, Double)]): (Long, Long, Double) = {
      var p = 0L; var q = 0L; var tx = 0L; var ty = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val sx = math.signum(pts(j)._1 - pts(i)._1)
        val sy = math.signum(pts(j)._2 - pts(i)._2)
        if (sx * sy > 0) p += 1
        else if (sx * sy < 0) q += 1
        if (sx == 0 && sy != 0) tx += 1
        if (sy == 0 && sx != 0) ty += 1
      }
      val n = pts.size.toLong
      val n0 = n * (n - 1) / 2
      val txy = n0 - p - q - tx - ty
      val tau = (p - q).toDouble /
        math.sqrt((n0 - tx - txy).toDouble * (n0 - ty - txy).toDouble)
      (p, q, tau)
    }
    val pts = (1 to 150).map(i =>
      (((i * 13) % 11).toDouble, ((i * 7) % 13 + (i % 11)).toDouble))
    val df = pts.toDF("x", "y")
    val r = Profile.kendallTau(df, col("x"), col("y")).head()
    val (p, q, tau) = brute(pts)
    assert(r.getDecimal(r.fieldIndex("concordant")).longValue == p)
    assert(r.getDecimal(r.fieldIndex("discordant")).longValue == q)
    assert(math.abs(r.getDouble(r.fieldIndex("tau_b")) - tau) < 1e-12)
    // perfect monotone: tau = 1; reversed: -1
    val mono = (1 to 30).map(i => (i.toDouble, (i * i).toDouble))
    val rm = Profile.kendallTau(mono.toDF("x", "y"), col("x"), col("y"))
      .head()
    assert(rm.getDouble(rm.fieldIndex("tau_b")) == 1.0)
    val rev = (1 to 30).map(i => (i.toDouble, -i.toDouble))
    val rr = Profile.kendallTau(rev.toDF("x", "y"), col("x"), col("y"))
      .head()
    assert(rr.getDouble(rr.fieldIndex("tau_b")) == -1.0)
    // constant y: denominator 0 -> NULL
    val flat = (1 to 10).map(i => (i.toDouble, 1.0))
    val rc = Profile.kendallTau(flat.toDF("x", "y"), col("x"), col("y"))
      .head()
    assert(rc.isNullAt(rc.fieldIndex("tau_b")))
    intercept[IllegalArgumentException] {
      Profile.kendallTau(df, col("x"), col("y"), maxCells = 5L)
    }
  }

  test("kendallTauBucketed: equals the exact arm on a discrete grid; " +
      "tracks it closely on continuous data") {
    import spark.implicits._
    val disc = (1 to 400).map(i =>
      (((i * 13) % 7).toDouble, ((i * 5) % 9 + (i % 7)).toDouble))
    val df = disc.toDF("x", "y")
    val ex = Profile.kendallTau(df, col("x"), col("y")).head()
    val bu = Profile.kendallTauBucketed(df, col("x"), col("y"),
      buckets = 64).head()
    assert(bu.getDouble(bu.fieldIndex("tau_b"))
      == ex.getDouble(ex.fieldIndex("tau_b")),
      "bucketed must equal exact when bins separate the support")
    // continuous: correlated lattice, tau within grid tolerance
    val cont = (1 to 2000).map { i =>
      val x = (i * 137 % 1999).toDouble / 1999
      (x, x * 0.8 + ((i * 31) % 101).toDouble / 101 * 0.4)
    }
    val cdf = cont.toDF("x", "y")
    val ce = Profile.kendallTau(cdf, col("x"), col("y"),
      maxCells = 5000L).head()
    val cb = Profile.kendallTauBucketed(cdf, col("x"), col("y"),
      buckets = 256).head()
    assert(math.abs(cb.getDouble(cb.fieldIndex("tau_b"))
      - ce.getDouble(ce.fieldIndex("tau_b"))) < 0.02)
  }

  test("speciesProfile: hand-worked counts; fold-invariance; " +
      "degenerate guards") {
    import spark.implicits._
    // counts {3, 2, 1, 1, 1}: N=8, V=5, n1=3, n2=1
    // missing = 3/8; chao1 = 5 + 3*2/(2*2) = 6.5
    // simpson = 1 - (6+2+0+0+0)/(8*7) = 1 - 8/56
    val df = Seq(3L, 2L, 1L, 1L, 1L).toDF("c")
    val r = Profile.speciesProfile(df, col("c")).head()
    assert(r.getLong(r.fieldIndex("n")) == 8L)
    assert(r.getLong(r.fieldIndex("v")) == 5L)
    assert(r.getDouble(r.fieldIndex("missing_mass")) == 3.0 / 8)
    assert(r.getDouble(r.fieldIndex("chao1")) == 6.5)
    assert(math.abs(r.getDouble(r.fieldIndex("simpson"))
      - (1.0 - 8.0 / 56)) < 1e-15)
    val hRef = -(3.0 / 8 * math.log(3.0 / 8)
      + 2.0 / 8 * math.log(2.0 / 8) + 3 * (1.0 / 8 * math.log(1.0 / 8)))
    assert(math.abs(r.getDouble(r.fieldIndex("shannon")) - hRef) < 1e-12)
    // monoid shape: partial count tables fold by summing counts
    val partA = Seq(("a", 2L), ("b", 1L), ("c", 1L))
    val partB = Seq(("a", 1L), ("b", 1L), ("d", 1L), ("e", 1L))
    val folded = (partA ++ partB).toDF("t", "c")
      .groupBy("t").agg(sum("c").as("c"))
    val rf = Profile.speciesProfile(folded, col("c")).head()
    assert(rf.getLong(rf.fieldIndex("n")) == 8L)
    assert(rf.getDouble(rf.fieldIndex("chao1")) == 6.5)
    // empty table: NULLs, not a crash
    val re = Profile.speciesProfile(df.where(lit(false)), col("c"))
      .head()
    assert(re.getLong(re.fieldIndex("n")) == 0L)
    assert(re.isNullAt(re.fieldIndex("missing_mass")))
  }

  test("dispersionTest: Poisson-like vs bursty counts; negative " +
      "refused; constant group") {
    import spark.implicits._
    // burst group: half zeros, half eights -> var >> mean
    val burst = (1 to 40).map(i => ("b", if (i % 2 == 0) 8.0 else 0.0))
    // tame group: alternating 3/5 -> var 1.03ish ~ mean 4
    val tame = (1 to 40).map(i => ("t", if (i % 2 == 0) 3.0 else 5.0))
    val df = (burst ++ tame).toDF("g", "v")
    val rows = Profile.dispersionTest(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val rb = rows("b"); val rt = rows("t")
    assert(rb.getDouble(rb.fieldIndex("ratio")) > 2.0)
    assert(rt.getDouble(rt.fieldIndex("ratio")) < 0.5)
    assert(rb.getDouble(rb.fieldIndex("z"))
      > rt.getDouble(rt.fieldIndex("z")))
    // hand check: mean 4, var = 40*16/39 for burst
    assert(math.abs(rb.getDouble(rb.fieldIndex("var"))
      - 40.0 * 16 / 39) < 1e-12)
    // constant group: var 0 -> ratio 0, z defined
    val c = (1 to 5).map(_ => ("c", 2.0)).toDF("g", "v")
    val rc = Profile.dispersionTest(c, Seq("g"), col("v")).head()
    assert(rc.getDouble(rc.fieldIndex("ratio")) == 0.0)
    intercept[IllegalArgumentException] {
      Profile.dispersionTest(Seq(("g", -1.0)).toDF("g", "v"),
        Seq("g"), col("v"))
    }
  }

  test("captureRecapture: textbook Chapman estimate; perfect overlap; " +
      "empty detector NULL") {
    import spark.implicits._
    // n_a=10, n_b=8, m=4: N = 11*9/5 - 1 = 18.8
    val rows = (1 to 20).map(i => (i <= 10, i > 6 && i <= 14))
    val r = Profile.captureRecapture(rows.toDF("a", "b"), col("a"),
      col("b")).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L
      && r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(r.fieldIndex("n_hat")) - 18.8) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("recall_a")) - 10 / 18.8)
      < 1e-12)
    val seRef = math.sqrt(11.0 * 9 * 6 * 4 / (25.0 * 6))
    assert(math.abs(r.getDouble(r.fieldIndex("se")) - seRef) < 1e-12)
    // both detectors identical: N-hat = n (recall 1 territory)
    val eq = (1 to 12).map(i => (i <= 6, i <= 6))
    val rq = Profile.captureRecapture(eq.toDF("a", "b"), col("a"),
      col("b")).head()
    assert(rq.getDouble(rq.fieldIndex("n_hat")) == 6.0)
    assert(rq.getDouble(rq.fieldIndex("se")) == 0.0)
    // an empty detector has no overlap information
    val z = Seq((true, false), (false, false)).toDF("a", "b")
    val rz = Profile.captureRecapture(z, col("a"), col("b")).head()
    assert(rz.isNullAt(rz.fieldIndex("n_hat")))
  }
}
