package graft.ops

import graft.SparkTestBase
import graft.api.{functions => gf}
import graft.expr.TextHash
import org.apache.spark.sql.functions._

/** Deterministic hash sampling: split stability, subset monotonicity,
  * bottom-k vs brute force, and the hash64 primitive itself. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def ids = (0L until 5000L).toDF("id")

  test("hash64 == TextHash.avalanche, in codegen and SQL") {
    val got = ids.select(col("id"), gf.hash64(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (i, h) => assert(h == TextHash.avalanche(i)) }
    val viaSql = spark.sql("SELECT hash64(42)").head().getLong(0)
    assert(viaSql == TextHash.avalanche(42L))
  }

  test("hashSplit: disjoint, covering, deterministic, near-target fractions") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(ids, col("id"), splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet == Set("train", "val", "test"))
    assert(a.values.sum == 5000L)
    assert(math.abs(a("train") / 5000.0 - 0.8) < 0.02, a.toString)
    assert(math.abs(a("val") / 5000.0 - 0.1) < 0.02, a.toString)
    // repartitioned input → identical assignment (determinism)
    val b = Sampling.hashSplit(ids.repartition(7), col("id"), splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("uniformSample: subset-monotone and unbiased-ish") {
    val s5 = Sampling.uniformSample(ids, col("id"), 0.05)
      .select("id").as[Long].collect().toSet
    val s20 = Sampling.uniformSample(ids, col("id"), 0.20)
      .select("id").as[Long].collect().toSet
    assert(s5.subsetOf(s20), "5% sample must be inside the 20% sample")
    assert(math.abs(s20.size / 5000.0 - 0.20) < 0.03)
    assert(Sampling.uniformSample(ids, col("id"), 0.0).count() == 0)
    assert(Sampling.uniformSample(ids, col("id"), 1.0).count() == 5000)
  }

  test("bottomK == brute-force k smallest unsigned hashes; plan is top-k") {
    val k = 37
    val got = Sampling.bottomK(ids, col("id"), k)
      .select("id").as[Long].collect().toSet
    val want = (0L until 5000L)
      .sortBy(i => TextHash.avalanche(i) ^ Long.MinValue).take(k).toSet
    assert(got == want)
    val plan = Sampling.bottomK(ids, col("id"), k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("stratifiedBottomK == per-group brute force; WindowGroupLimit plan") {
    val df = (0L until 3000L).map(i => (i, (i % 7).toString)).toDF("id", "g")
    val k = 11
    val got = Sampling.stratifiedBottomK(df, col("g"), col("id"), k)
      .select("g", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val want = (0L until 3000L).groupBy(i => (i % 7).toString).map {
      case (g, ids) => g ->
        ids.sortBy(i => TextHash.avalanche(i) ^ Long.MinValue).take(k).toSet
    }
    assert(got == want)
    // tiny group: returns the whole group, no padding
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.stratifiedBottomK(tiny, col("g"), col("id"), 5).count() == 3)
    // rank filter must push down as a group-limit, not a full sort
    val plan = Sampling.stratifiedBottomK(
        spark.read.parquet(sf("documents")), col("lang"), col("doc_id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("mixtureSample: quotas honored, brute-force membership, under-fill") {
    val df = (0L until 900L).map(i => (i, s"s${i % 3}")).toDF("id", "g")
    // weights 2:1:1 at total 100 → quotas 50/25/25
    val got = Sampling.mixtureSample(df, col("g"), col("id"),
        Seq("s0" -> 2.0, "s1" -> 1.0, "s2" -> 1.0), 100L)
      .select("g", "id").collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val want = (0L until 900L).groupBy(i => s"s${i % 3}").map {
      case (g, ids) =>
        val q = if (g == "s0") 50 else 25
        g -> ids.sortBy(i => TextHash.avalanche(i) ^ Long.MinValue)
          .take(q).toSet
    }
    assert(got == want)
    // unlisted group dropped; small group under-fills (no over-sampling)
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("id", "g")
    val m = Sampling.mixtureSample(tiny, col("g"), col("id"),
        Seq("a" -> 1.0, "b" -> 1.0), 20L)
      .select("g").collect().map(_.getString(0)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(m == Map("a" -> 2, "b" -> 1)) // quotas 10/10, groups exhausted
    // the literal max-quota bound keeps the WindowGroupLimit rewrite alive
    val plan = Sampling.mixtureSample(
        spark.read.parquet(sf("documents")), col("source"), col("doc_id"),
        Seq("src0" -> 0.5, "src1" -> 0.5), 40L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("temperatureMixture: alpha endpoints and sqrt quotas, brute-force") {
    // 600/200/100 rows in three groups
    val df = (0L until 900L).map(i =>
      (i, if (i < 600) "big" else if (i < 800) "mid" else "small"))
      .toDF("id", "g")
    def cnts(alpha: Double, total: Long): Map[String, Int] =
      Sampling.temperatureMixture(df, col("g"), col("id"), alpha, total)
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    // alpha=1: natural proportions — quotas 200/66/33 of 300
    assert(cnts(1.0, 300L) == Map("big" -> 200, "mid" -> 66, "small" -> 33))
    // alpha=0: uniform over groups
    assert(cnts(0.0, 90L) == Map("big" -> 30, "mid" -> 30, "small" -> 30))
    // alpha=0.5: ∝ sqrt(n) = 24.49/14.14/10 → quotas ⌊300·w/Σ⌋ = 151/87/61
    val s = math.sqrt(600.0) + math.sqrt(200.0) + math.sqrt(100.0)
    val want = Map(
      "big" -> math.floor(300 * math.sqrt(600.0) / s).toInt,
      "mid" -> math.floor(300 * math.sqrt(200.0) / s).toInt,
      "small" -> math.floor(300 * math.sqrt(100.0) / s).toInt)
    assert(cnts(0.5, 300L) == want)
    // membership = hash bottom-k within each group (same contract as
    // mixtureSample) — spot-check one group
    val got = Sampling.temperatureMixture(df, col("g"), col("id"), 0.5, 300L)
      .where(col("g") === "small").collect().map(_.getLong(0)).toSet
    val wantIds = (800L until 900L)
      .sortBy(i => TextHash.avalanche(i) ^ Long.MinValue)
      .take(want("small")).toSet
    assert(got == wantIds)
  }

  test("temperatureMixture: NULL groups excluded, native int keys, empty input") {
    // a NULL group must not become a phantom "null" quota that wastes rows
    val withNull = (Seq((0L, null.asInstanceOf[String])) ++
      (1L until 101L).map(i => (i, if (i <= 60) "a" else "b"))).toDF("id", "g")
    val got = Sampling.temperatureMixture(withNull, col("g"), col("id"), 1.0, 50L)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas over the 100 NON-null rows: ⌊50·60/100⌋=30, ⌊50·40/100⌋=20
    assert(got == Map("a" -> 30L, "b" -> 20L))
    // integer group column: quota comparison is native-typed, no string casts
    val intGroups = (0L until 300L).map(i => (i, (i % 3).toInt)).toDF("id", "g")
    val gi = Sampling.temperatureMixture(intGroups, col("g"), col("id"), 1.0, 90L)
      .groupBy("g").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gi == Map(0 -> 30L, 1 -> 30L, 2 -> 30L))
    // empty input (or all-null groups) → empty result, not a throw
    assert(Sampling.temperatureMixture(
      withNull.where(col("g").isNull), col("g"), col("id"), 1.0, 10L).count() == 0L)
    assert(Sampling.temperatureMixture(
      withNull.limit(0), col("g"), col("id"), 1.0, 10L).count() == 0L)
  }

  test("hash64: string/binary keys byte-hash; no numeric-cast collisions") {
    import spark.implicits._
    // '1' and '01' must NOT collide (the old implicit string→long cast
    // hashed the parsed value); strings hash their bytes
    val hs = Seq("1", "01").toDF("s").select(gf.hash64(col("s"))).as[Long]
      .collect()
    assert(hs(0) != hs(1))
    assert(hs(0) == TextHash.hashBytes("1".getBytes("UTF-8"), 0, 1, 0L))
    // binary key of the same bytes hashes identically to the string
    val hb = Seq("1").toDF("s")
      .select(gf.hash64(encode(col("s"), "UTF-8"))).as[Long].collect()
    assert(hb(0) == hs(0))
    // integral key: splitmix64 finalizer, unchanged
    val hi = Seq(42L).toDF("k").select(gf.hash64(col("k"))).as[Long].collect()
    assert(hi(0) == TextHash.avalanche(42L))
    // int widens losslessly to the same hash as the long
    val hw = Seq(42).toDF("k").select(gf.hash64(col("k"))).as[Long].collect()
    assert(hw(0) == TextHash.avalanche(42L))
    // non-key types are rejected at analysis, not mangled at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.5).toDF("d").select(gf.hash64(col("d"))).collect()
    }
    // deterministic string-keyed splits end-to-end
    val docs = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      .toDF("name")
    val s1 = Sampling.uniformSample(docs, col("name"), 0.6).collect().toSet
    val s2 = Sampling.uniformSample(docs.repartition(3), col("name"), 0.6)
      .collect().toSet
    assert(s1 == s2)
  }

  test("weightedBottomK == brute force min-of-w draws; zero-weight excluded") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, (i % 7).toInt)).toDF("id", "w")
    val k = 50
    val got = Sampling.weightedBottomK(df, col("id"), col("w"), k)
      .select("id").as[Long].collect().toSet
    // brute force on the same hash chain
    def priority(id: Long, w: Int): Option[Long] =
      if (w < 1) None
      else Some((0 until w).map(i => TextHash.avalanche(
        TextHash.avalanche(id) ^ (i * 0x9e3779b9L)) ^ Long.MinValue).min)
    val want = (0L until 3000L).flatMap(i => priority(i, (i % 7).toInt)
      .map(p => (p, i))).sorted.take(k).map(_._2).toSet
    assert(got == want)
    assert(!got.exists(_ % 7 == 0), "weight-0 rows must never be sampled")
    // partitioning invariance
    val got2 = Sampling.weightedBottomK(df.repartition(11), col("id"),
      col("w"), k).select("id").as[Long].collect().toSet
    assert(got2 == got)
  }

  test("weighted sampling: inclusion frequency tracks weight (both variants)") {
    import spark.implicits._
    // weights 1 vs 4: the w=4 class should be ~4× overrepresented in the
    // sample relative to class size
    val df = (0L until 20000L).map(i => (i, if (i % 2 == 0) 1.0 else 4.0))
      .toDF("id", "w")
    for (variant <- Seq("int", "es")) {
      val sampled =
        if (variant == "int")
          Sampling.weightedBottomK(df, col("id"), col("w").cast("int"), 2000)
        else Sampling.weightedBottomKES(df, col("id"), col("w"), 2000)
      val heavy = sampled.where(col("id") % 2 === 1).count().toDouble
      val frac = heavy / 2000.0
      // expected heavy fraction 4/5 = 0.8; allow generous sampling noise
      assert(math.abs(frac - 0.8) < 0.06, s"$variant heavy-frac $frac")
    }
  }

  test("thresholds normalize weights and hit the grid exactly") {
    assert(Sampling.thresholds(Seq(1.0, 1.0)) ==
      Seq(Sampling.Buckets / 2, Sampling.Buckets))
    assert(Sampling.thresholds(Seq(3.0, 1.0)) ==
      Seq(Sampling.Buckets * 3 / 4, Sampling.Buckets))
  }

  private def plan(avail: Seq[(String, Long)], targets: Seq[(String, Double)],
      total: Long): Map[String, (Long, Double, Long)] = {
    Sampling.mixturePlan(avail.toDF("src", "a"), "src", "a", targets, total)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
  }

  test("mixturePlan: water-filling caps the scarce source and re-spreads") {
    // equal weights, c can only supply 10 of its 50 share: the shortfall
    // re-spreads to a and b equally → 70/70/10
    val p = plan(Seq("a" -> 100L, "b" -> 100L, "c" -> 10L),
      Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 150L)
    assert(p("a")._3 == 70L && p("b")._3 == 70L && p("c")._3 == 10L)
  }

  test("mixturePlan: budget beyond the pool caps everything at availability") {
    val p = plan(Seq("a" -> 30L, "b" -> 20L),
      Seq("a" -> 1.0, "b" -> 9.0), 1000L)
    assert(p("a")._3 == 30L && p("b")._3 == 20L)
  }

  test("mixturePlan: unweighted and unlisted sources get quota 0") {
    val p = plan(Seq("a" -> 100L, "z" -> 100L, "u" -> 100L),
      Seq("a" -> 1.0, "z" -> 0.0), 100L)
    assert(p("a")._3 == 100L) // sole weighted source absorbs the budget
    assert(p("z")._3 == 0L && p("u")._3 == 0L)
    assert(p("u")._2 == 0.0) // missing target surfaces as weight 0
  }

  test("mixturePlan: uncapped quotas stay proportional to weights") {
    val p = plan(Seq("a" -> 1000L, "b" -> 1000L, "c" -> 5L),
      Seq("a" -> 1.0, "b" -> 3.0, "c" -> 1.0), 405L)
    // c capped at 5; remaining 400 splits 1:3 → 100/300
    assert(p("c")._3 == 5L)
    assert(p("a")._3 == 100L && p("b")._3 == 300L)
    val total = p.values.map(_._3).sum
    assert(total <= 405L && total >= 405L - 3) // floors lose < 1/source
  }

  test("mixturePlan: zero budget and empty availability behave") {
    val p = plan(Seq("a" -> 10L), Seq("a" -> 1.0), 0L)
    assert(p("a")._3 == 0L)
    val empty = Sampling.mixturePlan(
      Seq.empty[(String, Long)].toDF("src", "a"), "src", "a",
      Seq("a" -> 1.0), 10L)
    assert(empty.count() == 0)
  }

  test("epochPlan: repetition capacity, epochs/unique/repeated arithmetic") {
    def eplan(avail: Seq[(String, Long)], targets: Seq[(String, Double)],
        total: Long, maxE: Int) =
      Sampling.epochPlan(avail.toDF("src", "a"), "src", "a", targets,
          total, maxE)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(3), r.getDouble(4), r.getLong(5),
            r.getLong(6)))).toMap
    // equal weights, budget 150 over {a:100, c:10} with maxEpochs=2:
    // capacities {200, 20}; c saturates at 20 (its 75 share > 20 cap),
    // shortfall re-spreads to a → a=130, c=20
    val p = eplan(Seq("a" -> 100L, "c" -> 10L),
      Seq("a" -> 1.0, "c" -> 1.0), 150L, 2)
    assert(p("a") == ((100L, 130L, 1.3, 100L, 30L)))
    assert(p("c") == ((10L, 20L, 2.0, 10L, 10L)))
    // maxEpochs=1 degenerates to mixturePlan exactly
    val p1 = eplan(Seq("a" -> 100L, "b" -> 100L, "c" -> 10L),
      Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 150L, 1)
    assert(p1("a")._2 == 70L && p1("b")._2 == 70L && p1("c")._2 == 10L)
    assert(p1.values.forall(v => v._5 == 0L)) // no repetition at 1 epoch
    // zero-availability source: quota 0, epochs 0.0
    val pz = eplan(Seq("a" -> 50L, "z" -> 0L),
      Seq("a" -> 1.0, "z" -> 1.0), 40L, 3)
    assert(pz("z") == ((0L, 0L, 0.0, 0L, 0L)))
  }

  test("expandEpochs: quota-exact repetition, extra epochs = smallest hashes") {
    val df = (0 until 10).map(i => (i.toLong, if (i < 6) "a" else "b"))
      .toDF("id", "src")
    // a: 6 docs, quota 14 → 2 full epochs + 2 extra; b: 4 docs, quota 4
    // → exactly 1 epoch; c quota ignored (absent); zero-quota label drops
    val out = Sampling.expandEpochs(df, "id", "src",
        Seq(("a", 14L), ("b", 4L), ("c", 5L)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 18)
    val perSrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perSrc == Map("a" -> 14, "b" -> 4))
    // every b doc exactly once; a docs 2 or 3 times, extras = the two
    // smallest unsigned hash64 ids (quotaSample's membership rule)
    val aCounts = out.filter(_._2 == "a").groupBy(_._1)
      .view.mapValues(_.length).toMap
    assert(aCounts.values.toSet == Set(2, 3))
    val wantExtra = (0 until 6).map(_.toLong)
      .sortBy(i => graft.expr.TextHash.avalanche(i) ^ Long.MinValue)
      .take(2).toSet
    assert(aCounts.filter(_._2 == 3).keySet == wantExtra)
    // epoch indices are dense 0..e-1 per doc
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val eps = rows.map(_._3).sorted.toList
      assert(eps == (0L until eps.length.toLong).toList)
    }
  }

  test("quotaSample: explicit quotas == brute-force hash bottom-k per group") {
    val df = (0 until 600).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val quotas = Seq[(Any, Long)]("g0" -> 50L, "g1" -> 10L, "g2" -> 0L)
    val got = Sampling.quotaSample(df, col("g"), col("id"), quotas)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // brute force: per group, quota-many smallest unsigned hashes
    val want = (0 until 600).map(i => (s"g${i % 3}", i.toLong))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        val q = quotas.toMap.apply(g)
        rows.sortBy(r => TextHash.avalanche(r._2) ^ Long.MinValue)
          .take(q.toInt)
      }.toSet
    assert(got == want)
    assert(got.count(_._1 == "g2") == 0)
  }

  test("mixturePlan + quotaSample compose: per-source kept counts == plan") {
    val df = (0 until 900).map(i => (s"s${i % 3}", i.toLong)).toDF("src", "id")
    val avail = df.groupBy("src").agg(count(lit(1)).as("n"))
    val p = Sampling.mixturePlan(avail, "src", "n",
      Seq("s0" -> 2.0, "s1" -> 1.0, "s2" -> 1.0), 400L)
    val quotas = p.collect()
      .map(r => (r.getString(0): Any) -> r.getLong(3)).toSeq
    val kept = Sampling.quotaSample(df, col("src"), col("id"), quotas)
      .groupBy("src").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("s0" -> 200L, "s1" -> 100L, "s2" -> 100L))
  }

  test("splitByComponents: no pair straddles, components move as units, " +
      "singletons = plain hash split") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("id", "text")
    // components: {0,1,2} (chain), {10,11}, rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("idA", "idB")
    val out = Sampling.splitByComponents(docs, "id", pairs, 4)
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 200)
    // every component lands whole on one side
    assert(Set(out(0L), out(1L), out(2L)).size == 1)
    assert(out(10L) == out(11L))
    // singletons match the plain per-id hash split exactly
    val plain = docs.where(!col("id").isin(0L, 1L, 2L, 10L, 11L))
      .select(col("id"), when(pmod(graft.api.functions.hash64(col("id")),
        lit(4)) === 0, "eval").otherwise("train").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    plain.foreach { case (id, s) => assert(out(id) == s, s"id $id") }
    // both sides populated at this size and the eval share is ~1/4
    val nEval = out.values.count(_ == "eval")
    assert(nEval > 20 && nEval < 80, s"eval $nEval")
    // straddle check, the op's whole point
    Seq((0L, 1L), (1L, 2L), (10L, 11L)).foreach { case (a, b) =>
      assert(out(a) == out(b))
    }
  }

  test("temperatureTokenBudgets: sqrt shares, exact Hamilton totals") {
    import spark.implicits._
    // masses 100, 400, 900 -> weights 10:20:30e6 -> shares 1/6, 2/6, 3/6
    val df = Seq(("a", 100L), ("b", 400L), ("c", 900L))
      .toDF("src", "toks")
    val out = Sampling.temperatureTokenBudgets(df, col("src"),
        col("toks"), totalTokens = 600L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("a" -> 100L, "b" -> 200L, "c" -> 300L))
  }

  test("temperatureTokenBudgets: leftover goes to largest remainders") {
    import spark.implicits._
    // equal masses, total not divisible: 3 sources, 100 tokens ->
    // 33 each + 1 leftover; remainders tie -> lowest source name bumps
    val df = Seq(("a", 4L), ("b", 4L), ("c", 4L)).toDF("src", "toks")
    val out = Sampling.temperatureTokenBudgets(df, col("src"),
        col("toks"), totalTokens = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.values.sum == 100L)
    assert(out("a") == 34L && out("b") == 33L && out("c") == 33L)
  }

  test("temperatureTokenBudgets: group-cardinality contract enforced") {
    import spark.implicits._
    val df = (1 to 50).map(i => (s"g$i", 10L)).toDF("src", "toks")
    intercept[IllegalArgumentException] {
      Sampling.temperatureTokenBudgets(df, col("src"), col("toks"),
        1000L, maxGroups = 10)
    }
  }

  test("banditIndices: UCB1 and Beta posterior by hand") {
    import spark.implicits._
    // arm A: 4 pulls 3 wins; arm B: 4 pulls 1 win -> N = 8
    val df = Seq(("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false))
      .toDF("arm", "ok")
    val got = Sampling.banditIndices(df, Seq("arm"), col("ok"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(a.fieldIndex("pulls")) == 4L)
    assert(a.getLong(a.fieldIndex("wins")) == 3L)
    assert(a.getDouble(a.fieldIndex("mean_reward")) == 0.75)
    assert(math.abs(a.getDouble(a.fieldIndex("ucb1")) -
      (0.75 + math.sqrt(2 * math.log(8.0) / 4))) < 1e-15)
    assert(a.getLong(a.fieldIndex("post_alpha")) == 4L)
    assert(a.getLong(a.fieldIndex("post_beta")) == 2L)
    // same pulls -> exploration bonus equal, so UCB orders by mean
    assert(a.getDouble(a.fieldIndex("ucb1")) >
      got("B").getDouble(got("B").fieldIndex("ucb1")))
  }
  test("temporalSplit: boundary semantics (cutoff exclusive-right, " +
      "embargo half-open)") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-18 23:59:59"), // train (< cutoff - 3d)
      (2L, "2024-01-19 00:00:00"), // embargo (== cutoff - embargo)
      (3L, "2024-01-21 23:59:59"), // embargo
      (4L, "2024-01-22 00:00:00"), // test (== cutoff)
      (5L, "2024-01-25 00:00:00")  // test
    ).toDF("id", "s").withColumn("ts", col("s").cast("timestamp"))
    val got = Sampling.temporalSplit(df, col("ts"),
        lit("2024-01-22").cast("timestamp"), expr("INTERVAL 3 DAYS"))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "test"))
  }

  test("entityOverlap: counts entities straddling split pairs once each") {
    import spark.implicits._
    val df = Seq(
      (10L, "train"), (10L, "train"), (10L, "test"), // u10 in both
      (11L, "train"),                                 // train only
      (12L, "test"), (12L, "embargo"),                // test+embargo
      (13L, "train"), (13L, "test"), (13L, "embargo") // all three
    ).toDF("user_id", "split")
    val got = Sampling.entityOverlap(df, col("user_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("test", "train") -> 2L,      // u10, u13
      ("embargo", "test") -> 2L,    // u12, u13
      ("embargo", "train") -> 1L))  // u13
  }

  test("rake: both margins met simultaneously; 2x2 hand check; " +
      "structural-zero infeasibility fails fast; stray label refused") {
    import spark.implicits._
    // 2x2 with counts (a,x)=30 (a,y)=10 (b,x)=10 (b,y)=50;
    // targets: dim1 50/50, dim2 50/50
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(50)(("b", "y"))
    val df = rows.toDF("l", "s")
    val w = Sampling.rake(df, col("l"), col("s"),
      Seq("a" -> 0.5, "b" -> 0.5), Seq("x" -> 0.5, "y" -> 0.5))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(r.fieldIndex("w_share")))).toMap
    // margins of the weighted shares hit the targets
    def margin(sel: ((String, String)) => String, key: String) =
      w.collect { case (k, (_, sh)) if sel(k) == key => sh }.sum
    assert(math.abs(margin(_._1, "a") - 0.5) < 1e-8)
    assert(math.abs(margin(_._2, "x") - 0.5) < 1e-8)
    // weighted share stays a distribution
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-9)
    // per-row weight: cell share / natural share
    val (na, _) = w(("a", "x"))
    assert(na == 30L)
    // infeasible: dim1=a only occurs with x; asking a=0.9 AND x=0.1
    // cannot converge
    intercept[IllegalArgumentException] {
      Sampling.rake(
        (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "x")) ++
          Seq.fill(10)(("b", "y"))).toDF("l", "s"),
        col("l"), col("s"), Seq("a" -> 0.9, "b" -> 0.1),
        Seq("x" -> 0.1, "y" -> 0.9), iters = 30)
    }
    // unobserved target label
    intercept[IllegalArgumentException] {
      Sampling.rake(df, col("l"), col("s"),
        Seq("a" -> 0.5, "b" -> 0.3, "zz" -> 0.2),
        Seq("x" -> 0.5, "y" -> 0.5))
    }
  }

  test("neymanAllocation: hand-worked N*sigma split with largest " +
      "remainder; cap at stratum size; zero-variance stratum") {
    import spark.implicits._
    // stratum a: 4 rows sd 10 -> w 40; b: 4 rows sd 5 -> w 20;
    // c: 2 rows constant -> w 0. budget 6 -> raw (4, 2, 0)
    val rows =
      Seq(("a", 0.0), ("a", 20.0), ("a", 0.0), ("a", 20.0),
        ("b", 0.0), ("b", 10.0), ("b", 0.0), ("b", 10.0),
        ("c", 7.0), ("c", 7.0))
    val df = rows.toDF("g", "v")
    val r = Sampling.neymanAllocation(df, Seq("g"), col("v"), 6L)
      .orderBy("g").collect()
    val quota = r.map(x => x.getString(0) ->
      x.getLong(x.fieldIndex("quota"))).toMap
    assert(quota == Map("a" -> 4L, "b" -> 2L, "c" -> 0L))
    assert(r.map(_.getLong(r.head.fieldIndex("quota"))).sum == 6L)
    // sd exact: sqrt(400/3) for a
    val sdA = r.find(_.getString(0) == "a").get
    assert(math.abs(sdA.getDouble(sdA.fieldIndex("sd"))
      - math.sqrt(400.0 / 3)) < 1e-12)
    // budget larger than the weighted strata can hold: cap at n_rows
    val rc = Sampling.neymanAllocation(df, Seq("g"), col("v"), 40L)
      .orderBy("g").collect()
    val qc = rc.map(x => x.getString(0) ->
      x.getLong(x.fieldIndex("quota"))).toMap
    assert(qc("a") <= 4L && qc("b") <= 4L && qc("c") <= 2L)
    // remainder split: budget 7 -> raw (4.666, 2.333, 0); the extra
    // goes to a's larger remainder but a is CAPPED at its 4 rows, and
    // capped surplus is deliberately NOT redistributed (documented)
    val r7 = Sampling.neymanAllocation(df, Seq("g"), col("v"), 7L)
      .orderBy("g").collect()
    val q7 = r7.map(x => x.getString(0) ->
      x.getLong(x.fieldIndex("quota"))).toMap
    assert(q7 == Map("a" -> 4L, "b" -> 2L, "c" -> 0L), s"got $q7")
  }
}
