package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Reward advantage normalization (Reward.groupAdvantage /
  * leaveOneOutAdvantage). */
class RewardSpec extends SparkTestBase {

  // prompt p1: four candidates with spread; p2: a pair; p3: singleton;
  // p4: constant rewards (std = 0); p5: has a NULL reward
  private val rows: Seq[(String, Long, java.lang.Double)] = Seq(
    ("p1", 1L, 1.0), ("p1", 2L, 3.0), ("p1", 3L, 5.0), ("p1", 4L, 7.0),
    ("p2", 5L, 10.0), ("p2", 6L, 20.0),
    ("p3", 7L, 42.0),
    ("p4", 8L, 2.5), ("p4", 9L, 2.5), ("p4", 10L, 2.5),
    ("p5", 11L, 4.0), ("p5", 12L, null), ("p5", 13L, 8.0))

  private def df = {
    import spark.implicits._
    rows.toDF("prompt", "cand_id", "reward")
  }

  test("groupAdvantage standardizes within each prompt (ddof=1)") {
    val got = Reward.groupAdvantage(df, Seq("prompt"), col("reward"))
      .collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    // p1: mean 4, sample std = sqrt(20/3)
    val s1 = math.sqrt(20.0 / 3.0)
    assert(math.abs(got(1L).asInstanceOf[Double] - (-3.0 / s1)) < 1e-12)
    assert(math.abs(got(4L).asInstanceOf[Double] - (3.0 / s1)) < 1e-12)
    // p2: mean 15, std = sqrt(50) -> z = ±5/sqrt(50)
    assert(math.abs(got(5L).asInstanceOf[Double] + 5.0 / math.sqrt(50.0)) < 1e-12)
    // degenerate contract: singleton and constant groups -> 0.0
    assert(got(7L) == 0.0)
    assert(got(8L) == 0.0 && got(9L) == 0.0 && got(10L) == 0.0)
    // NULL reward -> NULL advantage; siblings standardize over non-nulls
    assert(got(12L) == null)
    assert(math.abs(got(11L).asInstanceOf[Double] + math.sqrt(0.5)) < 1e-12)
    assert(math.abs(got(13L).asInstanceOf[Double] - math.sqrt(0.5)) < 1e-12)
  }

  test("groupAdvantage withStats emits n/mean/std receipts") {
    val r = Reward.groupAdvantage(df, Seq("prompt"), col("reward"),
        withStats = true)
      .where(col("prompt") === "p1").limit(1).collect()(0)
    assert(r.getLong(r.fieldIndex("advantage_n")) == 4L)
    assert(r.getDouble(r.fieldIndex("advantage_mean")) == 4.0)
    assert(math.abs(r.getDouble(r.fieldIndex("advantage_std")) -
      math.sqrt(20.0 / 3.0)) < 1e-12)
  }

  test("leaveOneOutAdvantage baselines against the other candidates") {
    val got = Reward.leaveOneOutAdvantage(df, Seq("prompt"), col("reward"))
      .collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    // p1 cand 1: 1 - (3+5+7)/3 = -4; cand 4: 7 - (1+3+5)/3 = 4
    assert(got(1L) == -4.0 && got(4L) == 4.0)
    // p2: r - other = ±10
    assert(got(5L) == -10.0 && got(6L) == 10.0)
    // singleton -> 0.0; NULL -> NULL; p5 non-nulls baseline each other
    assert(got(7L) == 0.0)
    assert(got(12L) == null)
    assert(got(11L) == -4.0 && got(13L) == 4.0)
  }

  test("advantages are invariant to partitioning (exact_sum windows)") {
    val a = Reward.groupAdvantage(df.repartition(7), Seq("prompt"),
      col("reward")).orderBy("cand_id").collect().toSeq
    val b = Reward.groupAdvantage(df.coalesce(1), Seq("prompt"),
      col("reward")).orderBy("cand_id").collect().toSeq
    assert(a == b)
  }

  test("advantageFromStats under own-corpus stats == groupAdvantage bits") {
    val stats = Reward.groupStats(df, Seq("prompt"), col("reward"))
    val served = Reward.advantageFromStats(df, stats, Seq("prompt"),
        col("reward"))
      .select("cand_id", "advantage").orderBy("cand_id").collect().toSeq
    val trained = Reward.groupAdvantage(df, Seq("prompt"), col("reward"))
      .select("cand_id", "advantage").orderBy("cand_id").collect().toSeq
    assert(served == trained)
  }

  test("advantageFromStats: unseen group -> 0.0, stats stay frozen") {
    import spark.implicits._
    val stats = Reward.groupStats(df, Seq("prompt"), col("reward"))
    val fresh = Seq(("pX", 99L, 123.0), ("p1", 98L, 4.0))
      .toDF("prompt", "cand_id", "reward")
    val got = Reward.advantageFromStats(fresh, stats, Seq("prompt"),
        col("reward"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(99L) == 0.0) // pX never seen
    // p1 stats frozen from df (mean 4, std sqrt(20/3)): z(4.0) = 0
    assert(got(98L) == 0.0)
  }

  test("groupStats emits NULL std for singletons") {
    val st = Reward.groupStats(df, Seq("prompt"), col("reward"))
      .where(col("prompt") === "p3").collect()(0)
    assert(st.getLong(1) == 1L && st.getDouble(2) == 42.0 && st.isNullAt(3))
  }

  test("discountedReturns: hand-worked n-step returns, gamma 0.5") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, 8.0), ("u", 2L, 4.0), ("u", 3L, 2.0), ("u", 4L, 16.0),
      ("v", 9L, 5.0))
      .toDF("g", "t", "r")
    val got = Reward.discountedReturns(df, Seq("g"), col("t"), col("t"),
        col("r"), gamma = 0.5, horizon = 3)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(r.fieldIndex("return_togo")),
          r.getInt(r.fieldIndex("return_togo_n")))).toMap
    // t=1: 8 + 4/2 + 2/4 = 10.5 (horizon cuts off 16)
    assert(got(1L) == ((10.5, 3)))
    // t=2: 4 + 1 + 4 = 9.0
    assert(got(2L) == ((9.0, 3)))
    // t=3: 2 + 8 = 10.0 (only two left)
    assert(got(3L) == ((10.0, 2)))
    assert(got(4L) == ((16.0, 1)))
    assert(got(9L) == ((5.0, 1)))
  }

  test("discountedReturns: a NULL reward is 0 at ITS OWN step — later " +
      "rewards keep their discount slots") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, Some(8.0)), ("u", 2L, None), ("u", 3L, Some(4.0)))
      .toDF("g", "t", "r")
    val got = Reward.discountedReturns(df, Seq("g"), col("t"), col("t"),
        col("r"), gamma = 0.5, horizon = 3)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(r.fieldIndex("return_togo")),
          r.getInt(r.fieldIndex("return_togo_n")))).toMap
    // t=1: 8 + 0/2 + 4/4 = 9.0 — NOT 8 + 4/2 = 10.0, which is what a
    // silently-compacted NULL would produce (t=3's reward shifted into
    // the gamma^1 slot); _n counts STEPS in the frame, zero-filled ones
    // included
    assert(got(1L) == ((9.0, 3)))
    assert(got(2L) == ((2.0, 2))) // 0 + 4/2
    assert(got(3L) == ((4.0, 1)))
  }

  test("discountedReturns: partitioning-invariant bits") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("g" + i % 5, i.toLong,
      (i * 7 % 113) / 100.0)).toDF("g", "t", "r")
    val a = Reward.discountedReturns(df.repartition(7), Seq("g"),
      col("t"), col("t"), col("r")).orderBy("g", "t").collect().toSeq
    val b = Reward.discountedReturns(df.coalesce(1), Seq("g"),
      col("t"), col("t"), col("r")).orderBy("g", "t").collect().toSeq
    assert(a == b)
  }

  test("sessionReturns: returns never cross a session boundary") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // two sessions for u: events at 0s, 10s, then a 100s gap, 120s, 125s
    val df = Seq(
      ("u", 1L, ts(0), 8.0), ("u", 2L, ts(10), 4.0),
      ("u", 3L, ts(120), 2.0), ("u", 4L, ts(125), 16.0))
      .toDF("g", "id", "ts", "r")
    val got = Reward.sessionReturns(df, Seq("g"), col("ts"), col("id"),
        col("r"), gapSeconds = 60, gamma = 0.5, horizon = 8)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(r.fieldIndex("session_idx")),
          r.getDouble(r.fieldIndex("return_togo")))).toMap
    // session 0: G(1) = 8 + 2 = 10 (NOT including the 2.0/16.0 later)
    assert(got(1L) == ((0L, 10.0)))
    assert(got(2L) == ((0L, 4.0)))
    // session 1: G(3) = 2 + 8 = 10
    assert(got(3L) == ((1L, 10.0)))
    assert(got(4L) == ((1L, 16.0)))
  }

  test("offPolicyValue: IPS and SNIPS hand-worked, clipping applies") {
    import spark.implicits._
    // 4 rows; target matches rows 1 and 3; propensities 0.5 and 0.1
    val df = Seq(
      ("g", "a", 2.0, 0.5, "a"),  // w=2,  wr=4
      ("g", "b", 9.0, 0.5, "a"),  // miss
      ("g", "a", 1.0, 0.1, "a"),  // w=10, wr=10
      ("g", "c", 5.0, 0.25, "b")) // miss
      .toDF("g", "act", "r", "p", "tgt")
    val out = Reward.offPolicyValue(df, Seq("g"), col("act"), col("r"),
      col("p"), col("tgt")).collect()(0)
    assert(out.getLong(out.fieldIndex("n")) == 4L)
    assert(out.getLong(out.fieldIndex("n_matched")) == 2L)
    assert(out.getDouble(out.fieldIndex("sum_w")) == 12.0)
    assert(out.getDouble(out.fieldIndex("sum_wr")) == 14.0)
    assert(out.getDouble(out.fieldIndex("ips")) == 3.5)
    assert(math.abs(out.getDouble(out.fieldIndex("snips")) - 14.0 / 12.0)
      < 1e-15)
    // clip at 4: the 1/0.1 weight caps -> sum_w = 6, sum_wr = 8
    val c = Reward.offPolicyValue(df, Seq("g"), col("act"), col("r"),
      col("p"), col("tgt"), maxWeight = 4.0).collect()(0)
    assert(c.getDouble(c.fieldIndex("sum_w")) == 6.0)
    assert(c.getDouble(c.fieldIndex("sum_wr")) == 8.0)
  }

  test("offPolicyValue: bad propensities are dropped, zero-match NULL") {
    import spark.implicits._
    val df = Seq(
      ("g", "a", 1.0, 0.0, "b"), ("g", "a", 1.0, -1.0, "b"),
      ("g", "a", 3.0, 0.5, "b"))
      .toDF("g", "act", "r", "p", "tgt")
    val out = Reward.offPolicyValue(df, Seq("g"), col("act"), col("r"),
      col("p"), col("tgt")).collect()(0)
    assert(out.getLong(out.fieldIndex("n")) == 1L) // p<=0 rows dropped
    assert(out.getLong(out.fieldIndex("n_matched")) == 0L)
    assert(out.isNullAt(out.fieldIndex("snips")))
    assert(out.getDouble(out.fieldIndex("ips")) == 0.0)
  }

  test("reserved output columns are refused") {
    intercept[IllegalArgumentException] {
      Reward.groupAdvantage(df.withColumn("advantage", lit(1)),
        Seq("prompt"), col("reward"))
    }
  }

  // one episode: r = (1, 2, 3), V = (10, 20, 30), terminal V = 0
  // δ = (1 + 10 − 10, 2 + 15 − 20, 3 + 0 − 30) = (1, −3, −27)
  private def gaeDf = {
    import spark.implicits._
    Seq(("e1", 1L, 1.0, 10.0), ("e1", 2L, 2.0, 20.0),
      ("e1", 3L, 3.0, 30.0))
      .toDF("ep", "t", "r", "v")
  }

  test("gaeAdvantage folds (γλ)-discounted TD residuals") {
    val got = Reward.gaeAdvantage(gaeDf, Seq("ep"), col("t"), col("t"),
        col("r"), col("v"), gamma = 0.5, lam = 0.5)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(r.fieldIndex("gae")),
          r.getInt(r.fieldIndex("gae_n")))).toMap
    // γλ = 1/4: A3 = −27; A2 = −3 − 27/4; A1 = 1 − 3/4 − 27/16
    assert(got(3L) == (-27.0, 1))
    assert(got(2L) == (-9.75, 2))
    assert(got(1L) == (-1.4375, 3))
  }

  test("gaeAdvantage truncates at the horizon") {
    val got = Reward.gaeAdvantage(gaeDf, Seq("ep"), col("t"), col("t"),
        col("r"), col("v"), gamma = 0.5, lam = 0.5, horizon = 2)
      .collect().map(r => r.getLong(1) ->
        r.getDouble(r.fieldIndex("gae"))).toMap
    assert(got(1L) == 0.25) // 1 − 3/4, the δ3 term falls off the frame
  }

  test("gaeAdvantage λ=0 degenerates to the one-step TD residual") {
    val got = Reward.gaeAdvantage(gaeDf, Seq("ep"), col("t"), col("t"),
        col("r"), col("v"), gamma = 0.5, lam = 0.0)
      .collect().map(r => r.getLong(1) ->
        r.getDouble(r.fieldIndex("gae"))).toMap
    assert(got == Map(1L -> 1.0, 2L -> -3.0, 3L -> -27.0))
  }

  test("lengthBiasStats: exact OLS line, degenerate groups refuse") {
    import spark.implicits._
    val df = Seq(
      // g1: y = 2x exactly; g2: constant length (no line)
      ("g1", 1.0, 2.0), ("g1", 2.0, 4.0), ("g1", 3.0, 6.0),
      ("g2", 5.0, 1.0), ("g2", 5.0, 9.0))
      .toDF("g", "len", "r")
    val got = Reward.lengthBiasStats(df, Seq("g"), col("r"), col("len"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert(g1.getDouble(g1.fieldIndex("sxx_num")) == 6.0) // 3*14-36
    assert(g1.getDouble(g1.fieldIndex("sxy_num")) == 12.0)
    assert(g1.getDouble(g1.fieldIndex("slope")) == 2.0)
    assert(g1.getDouble(g1.fieldIndex("intercept")) == 0.0)
    assert(g1.getDouble(g1.fieldIndex("r2")) == 1.0)
    assert(got("g2").isNullAt(got("g2").fieldIndex("slope")))
  }

  test("lengthDebias: residuals under the fit, mean-centering fallback") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1.0, 2.5), ("g1", 2.0, 4.5), ("g1", 3.0, 6.5),
      ("g2", 5.0, 1.0), ("g2", 5.0, 9.0))
      .toDF("g", "len", "r")
    val got = Reward.lengthDebias(df, Seq("g"), col("r"), col("len"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(r.fieldIndex("reward_debiased"))).toMap
    // g1 fits y = 2x + 0.5 exactly -> all residuals 0
    assert(got(("g1", 1.0)) == 0.0 && got(("g1", 3.0)) == 0.0)
    // g2 has no line: center on the mean 5.0
    assert(got(("g2", 5.0)) == -4.0 ||
      math.abs(got(("g2", 5.0))) == 4.0)
  }

  test("klEstimators: hand-worked k1/k2/k3, NULLs refused work") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double, java.lang.Double)](
      ("g", -1.0, -0.5), ("g", -2.0, -3.0), ("g", null, -1.0))
      .toDF("grp", "lp", "lr")
    val r = Reward.klEstimators(df, Seq("grp"), col("lp"), col("lr"))
      .collect()(0)
    // logr = (0.5, −1.0); the NULL-lp row drops out of n
    assert(r.getLong(r.fieldIndex("n")) == 2L)
    assert(r.getDouble(r.fieldIndex("k1")) == 0.25)
    assert(r.getDouble(r.fieldIndex("k2")) == 0.3125)
    val k3 = (math.exp(0.5) - 1.5 + math.exp(-1.0)) / 2
    assert(math.abs(r.getDouble(r.fieldIndex("k3")) - k3) < 1e-15)
  }

  test("klEstimators: identical models give zero KL on all three") {
    import spark.implicits._
    val df = Seq(("g", -1.25), ("g", -0.5)).toDF("grp", "lp")
    val r = Reward.klEstimators(df, Seq("grp"), col("lp"), col("lp"))
      .collect()(0)
    assert(r.getDouble(r.fieldIndex("k1")) == 0.0)
    assert(r.getDouble(r.fieldIndex("k2")) == 0.0)
    assert(r.getDouble(r.fieldIndex("k3")) == 0.0)
  }

  test("groupDroWeights: worst group dominates, weights sum to 1") {
    import spark.implicits._
    // mean losses: g1 = 1.0, g2 = 0.0; eta = ln 4 -> ratio 4:1
    val df = Seq(("g1", 1.0), ("g1", 1.0), ("g2", 0.0))
      .toDF("g", "loss")
    val got = Reward.groupDroWeights(df, Seq("g"), col("loss"),
        eta = math.log(4.0))
      .collect().map(r => r.getString(0) ->
        r.getDouble(r.fieldIndex("weight"))).toMap
    assert(math.abs(got("g1") - 0.8) < 1e-12)
    assert(math.abs(got("g2") - 0.2) < 1e-12)
    assert(math.abs(got.values.sum - 1.0) < 1e-15)
  }

  test("ppoClipStats: census against log-space thresholds, surrogate") {
    import spark.implicits._
    // Δ = (ln 2, 0, −ln 2) with A = (1, 1, −1):
    // r = (2, 1, 0.5); clipped = (yes, no, yes)
    val l2 = math.log(2.0)
    val df = Seq(("g", l2, 0.0, 1.0), ("g", 0.0, 0.0, 1.0),
      ("g", -l2, 0.0, -1.0)).toDF("grp", "ln", "lo", "a")
    val r = Reward.ppoClipStats(df, Seq("grp"), col("ln"), col("lo"),
      col("a"), eps = 0.2).collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 3L)
    assert(r.getLong(r.fieldIndex("n_clipped")) == 2L)
    assert(math.abs(r.getDouble(r.fieldIndex("mean_ratio")) -
      3.5 / 3) < 1e-15)
    // surrogates: min(2·1, 1.2·1) = 1.2; min(1·1, 1·1) = 1;
    // min(0.5·(−1), 0.8·(−1)) = −0.8 (the pessimistic branch, the
    // PPO lower bound). Mean = (1.2 + 1 − 0.8)/3
    assert(math.abs(r.getDouble(r.fieldIndex("mean_surrogate")) -
      (1.2 + 1.0 - 0.8) / 3) < 1e-12)
    // approx_kl = mean((r−1)−Δ) = (1−l2 + 0 + (−0.5+l2))/3
    assert(math.abs(r.getDouble(r.fieldIndex("approx_kl")) -
      (1.0 - l2 + 0.0 + (-0.5 + l2)) / 3) < 1e-15)
  }

  test("dpoReceipts: margins, accuracy census, stable softplus loss") {
    import spark.implicits._
    // pair 1: margin = (−1 − −2) − (−3 − −5) = 1 − 2 = −1 (wrong)
    // pair 2: margin = (−1 − −4) − (−2 − −2) = 3 (right)
    val df = Seq(("g", -1.0, -3.0, -2.0, -5.0),
      ("g", -1.0, -2.0, -4.0, -2.0))
      .toDF("grp", "cp", "rp", "cr", "rr")
    val r = Reward.dpoReceipts(df, Seq("grp"), col("cp"), col("rp"),
      col("cr"), col("rr"), beta = 1.0).collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 2L)
    assert(r.getLong(r.fieldIndex("n_correct")) == 1L)
    assert(r.getDouble(r.fieldIndex("accuracy")) == 0.5)
    assert(r.getDouble(r.fieldIndex("mean_margin")) == 1.0)
    val loss = (math.log1p(math.exp(-1.0)) + 1.0 +
      math.log1p(math.exp(-3.0))) / 2
    assert(math.abs(r.getDouble(r.fieldIndex("mean_loss")) - loss)
      < 1e-15)
  }

  test("specDecodeAcceptance: accept rule, block expectation, α=1 edge") {
    import spark.implicits._
    // ratios e^(lt-ld): ln2 -> 2 (clamps to 1), -ln2 -> 0.5
    val df = Seq(("g", 0.0, math.log(2.0)), ("g", 0.0, -math.log(2.0)))
      .toDF("grp", "ld", "lt")
    val r = Reward.specDecodeAcceptance(df, Seq("grp"), col("ld"),
      col("lt"), k = 4).collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 2L)
    assert(r.getDouble(r.fieldIndex("alpha")) == 0.75)
    // (1 - 0.75^5) / 0.25
    assert(math.abs(r.getDouble(r.fieldIndex("e_tokens")) -
      (1.0 - math.pow(0.75, 5)) / 0.25) < 1e-15)
    // a perfect draft accepts everything: k+1 tokens per block
    val p = Reward.specDecodeAcceptance(df, Seq("grp"), col("ld"),
      col("ld"), k = 4).collect()(0)
    assert(p.getDouble(p.fieldIndex("e_tokens")) == 5.0)
  }

  test("gaeAdvantage λ=1 horizon≥T equals return-to-go minus value") {
    // classic identity: Σ γ^k δ_{t+k} (full, λ=1) = G_t − V_t
    val a = Reward.gaeAdvantage(gaeDf, Seq("ep"), col("t"), col("t"),
        col("r"), col("v"), gamma = 0.5, lam = 1.0, horizon = 16)
      .select(col("t"), col("gae"))
    val g = Reward.discountedReturns(gaeDf, Seq("ep"), col("t"),
        col("t"), col("r"), gamma = 0.5, horizon = 16)
      .select(col("t").as("t2"), (col("return_togo") - col("v")).as("gmv"))
    val j = a.join(g, col("t") === col("t2")).collect()
    j.foreach(r => assert(math.abs(r.getDouble(r.fieldIndex("gae")) -
      r.getDouble(r.fieldIndex("gmv"))) < 1e-12))
  }
  test("vTrace: hand-worked 3-step sequence (targets and advantages)") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, 1.0, 2.0, 2.0),  // rho=c=1 (clipped)
      (1L, 1L, 0.0, 4.0, 0.5),  // rho=c=0.5
      (1L, 2L, 2.0, 1.0, 1.0)   // rho=c=1
    ).toDF("g", "t", "r", "v", "is")
    val got = Reward.vTrace(df, Seq("g"), col("t"), col("t"),
        col("r"), col("v"), col("is"), gamma = 0.5, rhoBar = 1.0,
        cBar = 1.0, horizon = 16)
      .orderBy("t").collect()
    // deltas: 1, -1.75, 1
    assert(got(0).getDouble(got(0).fieldIndex("vtrace")) == 2.25)
    assert(got(1).getDouble(got(1).fieldIndex("vtrace")) == 2.5)
    assert(got(2).getDouble(got(2).fieldIndex("vtrace")) == 2.0)
    assert(got(0).getDouble(got(0).fieldIndex("vtrace_adv")) == 0.25)
    assert(got(1).getDouble(got(1).fieldIndex("vtrace_adv")) == -1.5)
    assert(got(2).getDouble(got(2).fieldIndex("vtrace_adv")) == 1.0)
    assert(got.map(_.getInt(got(0).fieldIndex("vtrace_n"))).toSeq
      == Seq(3, 2, 1))
  }

  test("vTrace with IS == 1 degenerates to the on-policy lambda=1 " +
      "return: vtrace - V == gae(lambda=1)") {
    import spark.implicits._
    val df = (0 until 12).map(t =>
      (t / 6L, t.toLong, (t * 7 % 5).toDouble, (t % 4).toDouble, 1.0))
      .toDF("g", "t", "r", "v", "is")
    val vt = Reward.vTrace(df, Seq("g"), col("t"), col("t"),
        col("r"), col("v"), col("is"), gamma = 0.5, horizon = 16)
      .select(col("g"), col("t"), (col("vtrace") - col("v")).as("corr"))
    val gae = Reward.gaeAdvantage(df, Seq("g"), col("t"), col("t"),
      col("r"), col("v"), gamma = 0.5, lam = 1.0, horizon = 16)
    val j = vt.join(gae.select(col("g"), col("t"), col("gae")),
      Seq("g", "t")).collect()
    assert(j.nonEmpty && j.forall(r =>
      math.abs(r.getDouble(r.fieldIndex("corr")) -
        r.getDouble(r.fieldIndex("gae"))) < 1e-12))
  }

  test("vTrace: truncation-ordering guard, NULL ratio neutral") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0, 1.0, null.asInstanceOf[java.lang.Double]))
      .toDF("g", "t", "r", "v", "is")
    intercept[IllegalArgumentException] {
      Reward.vTrace(df, Seq("g"), col("t"), col("t"), col("r"),
        col("v"), col("is"), rhoBar = 1.0, cBar = 2.0)
    }
    // NULL ratio -> IS = 1 (neutral): same as explicit 1.0
    val a = Reward.vTrace(df, Seq("g"), col("t"), col("t"), col("r"),
      col("v"), col("is"), gamma = 0.5).head()
    val b = Reward.vTrace(df.withColumn("is", lit(1.0)), Seq("g"),
      col("t"), col("t"), col("r"), col("v"), col("is"),
      gamma = 0.5).head()
    assert(a.getDouble(a.fieldIndex("vtrace")) ==
      b.getDouble(b.fieldIndex("vtrace")))
  }
}
