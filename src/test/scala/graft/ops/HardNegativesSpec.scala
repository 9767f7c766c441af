package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hard-negative mining (Similarity.hardNegatives) and the generic
  * 64-bit fingerprint pair machinery (Dedup.hammingPairs). */
class HardNegativesSpec extends SparkTestBase {
  import spark.implicits._

  test("hammingPairs: planted fingerprints within/beyond the radius") {
    val rows = Seq(
      (1L, 0x0F0F0F0FL), (2L, 0x0F0F0F0EL),           // hamming 1
      (3L, 0x0F0F0F0FL ^ (1L << 40) ^ (1L << 5)),     // hamming 2 vs id 1
      (4L, 0x70F0F0F0FL),                              // far from everything
      (5L, -1L)).toDF("id", "fp")                      // far (all ones)
    val got = Dedup.hammingPairs(rows, "id", "fp", maxHamming = 2, chunks = 4)
      .select("idA", "idB", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 2)),
      s"got $got") // 2-3 differ by 3 bits -> excluded
  }

  test("hammingPairs drops NULL fingerprints; equals simhashPairs on text") {
    val rows = Seq((1L, Some(5L)), (2L, Some(5L)), (3L, None))
      .toDF("id", "fp")
    val got = Dedup.hammingPairs(rows, "id", "fp", 1, 4).count()
    assert(got == 1)
    // simhashPairs must be exactly hammingPairs over simhash64
    val docs = spark.read.parquet(sf("documents"))
      .select("doc_id", "text").limit(120)
    val direct = Dedup.simhashPairs(docs, "doc_id", "text",
      shingleN = 2, maxHamming = 3, chunks = 4)
      .select("idA", "idB", "hamming").collect().toSet
    val viaFp = Dedup.hammingPairs(
      docs.select(col("doc_id"),
        graft.api.functions.simhash64(col("text"), 2).as("fp")),
      "doc_id", "fp", maxHamming = 3, chunks = 4)
      .select("idA", "idB", "hamming").collect().toSet
    assert(direct == viaFp)
  }

  test("hammingPairsAdaptive: both tiers reproduce brute force exactly") {
    // 400 random fingerprints + planted near-pairs; brute-force truth at
    // maxHamming = 3. budget=Long.MaxValue → single-level tier;
    // budget=0 → forced two-level (multi-index) tier. The recall
    // contract (complete for hamming ≤ chunks−1) must hold on BOTH.
    val rnd = new scala.util.Random(91)
    val base = (0 until 400).map(i => (i.toLong, rnd.nextLong()))
    val planted = (0 until 40).map { i =>
      val (src, fp) = base(rnd.nextInt(400))
      val flips = rnd.nextInt(4) // 0..3 bit flips
      var v = fp
      (0 until flips).foreach(_ => v ^= 1L << rnd.nextInt(64))
      (1000L + i, v)
    }
    val all = base ++ planted
    val truth = (for {
      (ia, fa) <- all; (ib, fb) <- all
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb))).toSet
    val df = all.toDF("id", "fp").repartition(5)
    val single = Dedup.hammingPairsAdaptive(df, "id", "fp", 3, 4,
        candidateBudget = Long.MaxValue)
      .select("idA", "idB", "hamming").as[(Long, Long, Int)].collect().toSet
    val multi = Dedup.hammingPairsAdaptive(df, "id", "fp", 3, 4,
        candidateBudget = 0L)
      .select("idA", "idB", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(single == truth, s"single-level missed/invented pairs")
    assert(multi == truth, s"two-level missed/invented pairs")
  }

  test("hardNegatives: near-dup neighbors are excluded, ranking is preserved") {
    // query 0; corpus: 1 = exact copy (near-dup, high cosine), 2 = close
    // vector + different text (the hard negative), 3 = medium, 4 = far
    val mk = (s: Double) => Seq(1.0, s, 0.0)
    val corpus = Seq(
      (1L, Seq(1.0, 0.001, 0.0), "alpha beta gamma delta epsilon zeta"),
      (2L, Seq(1.0, 0.05, 0.0), "one two three four five six seven"),
      (3L, Seq(1.0, 0.4, 0.0), "eight nine ten eleven twelve thirteen"),
      (4L, Seq(-1.0, 0.0, 0.0), "fourteen fifteen sixteen seventeen"))
      .toDF("id", "vec", "text")
    val queries = Seq(
      (0L, mk(0.0), "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "vec", "text")
    val got = Similarity.hardNegatives(corpus, queries, "id", "vec", "text",
      k = 2, candidates = 4, shingleN = 3, tau = 0.5)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    // id 1 has the best cosine but identical text -> excluded;
    // survivors ranked by cosine: 2 then 3
    assert(got == Seq((2L, 1), (3L, 2)), s"got $got")
  }

  test("marginPairs: hand-computed margins; hub partner suppressed") {
    // a0's raw-cosine best is the HUB b9 (cos 0.9 to every a), but the
    // margin criterion normalizes by b9's saturated neighborhood and
    // picks the exclusive partner b0 instead
    def unit(x: Double, y: Double, z: Double) = {
      val n = math.sqrt(x * x + y * y + z * z); Seq(x / n, y / n, z / n)
    }
    val c = math.sqrt(1 - 0.9 * 0.9)
    val as = Seq(
      (0L, unit(1, 0, 0)), (1L, unit(0, 1, 0)), (2L, unit(0, 0, 1)))
      .toDF("id", "vec")
    // b0 ~ a0 at cos ~0.95; b9 = hub at cos 0.9 to a0 and high to others
    val bs = Seq(
      (10L, unit(0.95, math.sqrt(1 - 0.95 * 0.95), 0)),
      (19L, unit(0.9, c / math.sqrt(2), c / math.sqrt(2))),
      (11L, unit(0.1, 1, 0.1)), (12L, unit(0.1, 0.1, 1)))
      .toDF("id", "vec")
    val got = Similarity.marginPairs(as, bs, "id", "vec", k = 2,
      minMargin = 0.0).orderBy("a_id")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    // reference margins computed independently
    def cos(u: Seq[Double], v: Seq[Double]) =
      BigDecimal(u.zip(v).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val aV = Map(0L -> unit(1, 0, 0), 1L -> unit(0, 1, 0), 2L -> unit(0, 0, 1))
    val bV = Map(10L -> unit(0.95, math.sqrt(1 - 0.95 * 0.95), 0),
      19L -> unit(0.9, c / math.sqrt(2), c / math.sqrt(2)),
      11L -> unit(0.1, 1, 0.1), 12L -> unit(0.1, 0.1, 1))
    def topAvg(m: Map[Long, Seq[Double]], v: Seq[Double], k: Int) =
      m.values.map(cos(_, v)).toSeq.sorted.reverse.take(k).sum / k
    val want = aV.map { case (aid, av) =>
      val best = bV.map { case (bid, bv) =>
        val margin = BigDecimal(cos(av, bv) /
            ((topAvg(bV, av, 2) + topAvg(aV, bv, 2)) / 2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (bid, margin)
      }.toSeq.maxBy { case (bid, mg) => (mg, -bid) }
      aid -> best._1
    }
    got.foreach { case (aid, bid) =>
      assert(bid == want(aid), s"a=$aid got $bid want ${want(aid)}")
    }
  }

  test("marginPairsFrom: threshold filters, one row per a, rank determinism") {
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 10L, 0.5), (2L, 11L, 0.85))
      .toDF("a_id", "b_id", "cosine")
    val all = Similarity.marginPairsFrom(scored, k = 2, minMargin = 0.0)
      .collect()
    assert(all.length == 2) // one per a_id
    val high = Similarity.marginPairsFrom(scored, k = 2, minMargin = 2.0)
      .collect()
    assert(high.isEmpty)
  }

  test("incrementalProcess ≡ full recompute; unchanged rows truly reuse") {
    val newC = (0L until 40L).map(i => (i, s"text number $i body")).toDF("id", "text")
    // old: ids 0-34 present; 30-34 had different text (changed); 100-102 removed
    val oldC = ((0L until 35L).map(i =>
        (i, if (i >= 30) s"OLD $i" else s"text number $i body")) ++
      Seq((100L, "gone"), (101L, "gone"), (102L, "gone")))
      .toDF("id", "text")
    def proc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), upper(col("text")).as("out"))
    // prev output carries a SENTINEL so reuse is distinguishable from
    // reprocessing
    val prev = proc(oldC).withColumn("out",
      concat(lit("PREV:"), col("out")))
    val got = graft.ops.Pipeline.incrementalProcess(oldC, newC, prev,
      "id", "text")(proc).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 40)
    // unchanged ids (0-29) came from prev (sentinel intact)
    (0L until 30L).foreach(i => assert(got(i) == s"PREV:TEXT NUMBER $i BODY"))
    // changed (30-34) and added (35-39) were freshly processed
    (30L until 40L).foreach(i => assert(got(i) == s"TEXT NUMBER $i BODY"))
    // removed ids absent
    assert(!got.contains(100L))
  }

  test("hardNegatives keeps jaccard column and respects k") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")).where(col("doc_id") < 60)
    val emb = spark.read.parquet(sf("embeddings")).where(col("vec_id") < 60)
    val corpus = emb.join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("text"))
    val queries = corpus.where(col("id") < 3)
    val got = Similarity.hardNegatives(corpus, queries, "id", "vec", "text",
      k = 5, candidates = 10)
    assert(got.columns.toSeq ==
      Seq("query_id", "neighbor_id", "cosine", "jaccard", "rank"))
    val perQuery = got.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQuery.forall(_ <= 5))
    assert(got.where(col("jaccard") >= 0.5).count() == 0)
  }
  test("dimTruncationReport: full width = 1.0, recall monotone-ish, " +
      "hand-verifiable on axis vectors") {
    // corpus of 2-dim one-hot-ish vectors where the FIRST dim alone
    // already ranks correctly for q0 but inverts for q1
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.8, 0.6)))
    val df = rows.toDF("id", "vec")
    val got = Similarity.dimTruncationReport(df, df.where(col("id") < 2),
        "id", "vec", Seq(1, 2), k = 2)
      .orderBy("dim").collect()
    assert(got.length == 2)
    // full width reproduces the truth exactly
    assert(got(1).getInt(0) == 2 && got(1).getDouble(3) == 1.0 &&
      got(1).getDouble(4) == 1.0)
    // d=1: every vector collapses to cosine 1 on dim 1 (sign aside), so
    // ranking degrades -> recall at most 1, at least the id-tiebreak floor
    assert(got(0).getDouble(3) <= 1.0 && got(0).getDouble(3) >= 0.25)
    // fixture embeddings: d=64 row is exact-1 sanity on real data
    val emb = spark.read.parquet(sf("embeddings"))
    val rep = Similarity.dimTruncationReport(emb,
        emb.where(col("vec_id") < 5), "vec_id", "embedding",
        Seq(16, 64), k = 5).orderBy("dim").collect()
    assert(rep(1).getDouble(3) == 1.0)
    assert(rep(0).getDouble(3) > 0.0)
  }
}
