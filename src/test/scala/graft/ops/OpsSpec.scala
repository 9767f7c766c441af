package graft.ops

import graft.SparkTestBase
import graft.api.{functions => gf}
import graft.media.Media
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: text analysis, dedup families,
  * similarity search, multimodal plumbing. Brute-force oracles are computed
  * in-process over collected small fixtures. */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("documents")).cache()

  test("token_count matches whitespace split semantics") {
    val rows = docs.select(col("text"),
      gf.token_count(col("text")).as("tc")).collect()
    rows.foreach { r =>
      val expected = r.getString(0).trim.split("\\s+").count(_.nonEmpty)
      assert(r.getInt(1) == expected)
    }
    // edge cases
    val edge = Seq("", "   ", "one", " a  b\t c \n", "xy").toDF("t")
      .select(gf.token_count(col("t"))).as[Int].collect()
    assert(edge.toSeq == Seq(0, 0, 1, 3, 2))
  }

  test("text_stats ratios on crafted strings") {
    val r = Seq("Ab1! x").toDF("t").select(gf.text_stats(col("t")).as("s"))
      .select("s.n_chars", "s.n_tokens", "s.alpha_ratio", "s.digit_ratio",
        "s.punct_ratio", "s.space_ratio", "s.upper_ratio").head()
    assert(r.getInt(0) == 6 && r.getInt(1) == 2)
    assert(math.abs(r.getDouble(2) - 3.0 / 6) < 1e-15) // A b x
    assert(math.abs(r.getDouble(3) - 1.0 / 6) < 1e-15) // 1
    assert(math.abs(r.getDouble(4) - 1.0 / 6) < 1e-15) // !
    assert(math.abs(r.getDouble(5) - 1.0 / 6) < 1e-15) // space
    assert(math.abs(r.getDouble(6) - 1.0 / 6) < 1e-15) // A
    val empty = Seq("").toDF("t").select(gf.text_stats(col("t")).as("s"))
      .select("s.n_chars", "s.n_tokens", "s.alpha_ratio").head()
    assert(empty.getInt(0) == 0 && empty.getInt(1) == 0 && empty.getDouble(2) == 0.0)
  }

  test("lang_id on hand-written sentences") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("el perro corre en la casa y come con el gato", "es"),
      ("der hund und die katze sind nicht im haus", "de"),
      ("le chien et le chat sont dans la maison pour les vacances", "fr"),
      ("今天天气很好我们去公园散步吧", "zh"),
      ("zxqj wvkp mlrt", "und"))
    val out = samples.map(_._1).toDF("t")
      .select(gf.lang_id(col("t"))).as[String].collect()
    assert(out.toSeq == samples.map(_._2))
  }

  test("exact dedup keeps min-id row per duplicate group") {
    val base = docs.select("doc_id", "text")
    // duplicate every doc with a shifted id and extra whitespace/case noise
    val dups = base.select((col("doc_id") + 10000).as("doc_id"),
      upper(concat(lit("  "), col("text"))).as("text"))
    val deduped = Dedup.exact(base.union(dups), "doc_id", "text").cache()
    assert(deduped.count() == base.count())
    assert(deduped.agg(max("doc_id")).head().getLong(0) < 10000) // originals kept
    // without normalization the noisy copies survive
    val raw = Dedup.exact(base.union(dups), "doc_id", "text", normalize = false)
    assert(raw.count() == 2 * base.count())
  }

  test("minhash signature: identical texts match, estimate tracks jaccard") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val t3 = "completely different words with nothing shared at all here truly"
    val df = Seq((1L, t1), (2L, t1), (3L, t2), (4L, t3)).toDF("id", "text")
    val sigs = df.select(col("id"),
      gf.minhash_signature(col("text"), 2, 128, 42L).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    val exact12 = df.where(col("id") === 1).select(
      gf.ngram_jaccard(lit(t1), lit(t2), 2)).head().getDouble(0)
    assert(math.abs(est(sigs(1L), sigs(3L)) - exact12) < 0.15)
    assert(est(sigs(1L), sigs(4L)) < 0.2)
  }

  test("minhashPairs finds planted near-duplicates with exact jaccard") {
    val base = docs.select(col("doc_id"), col("text"))
    // plant near-dups: drop the first token of each text
    val near = base.limit(50).select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    val all = base.union(near)
    val pairs = Dedup.minhashPairs(all, "doc_id", "text",
      shingleN = 3, numHashes = 128, bands = 32, threshold = 0.5).collect()
    // every planted pair (id, id+10000) must be found
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 50).map(i => (i.toLong, i + 10000L)).toSet
    assert(expected.subsetOf(found),
      s"missing ${expected.diff(found).size} planted pairs")
    // jaccard values must equal the exact shingle jaccard (verified expr)
    pairs.foreach(r => assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
  }

  test("simhashPairs is complete for hamming <= chunks-1 (brute-force check)") {
    val base = docs.select(col("doc_id"), col("text"))
    val near = base.limit(30).select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    val all = base.union(near).cache()
    val hashes = all.select(col("doc_id"), gf.simhash64(col("text"), 2).as("h"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val got = Dedup.simhashPairs(all, "doc_id", "text", shingleN = 2,
      maxHamming = 3, chunks = 4)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
  }

  private lazy val emb = spark.read.parquet(sf("embeddings")).cache()

  test("vec_cosine matches in-process computation; norm/dot consistent") {
    val rows = emb.limit(20).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val df = emb.limit(20)
    val spark0 = df.alias("a").join(df.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        gf.vec_cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[(Long, Long, Double)].collect()
    val m = rows.toMap
    spark0.foreach { case (ia, ib, c) =>
      val x = m(ia).map(_.toDouble).toArray
      val y = m(ib).map(_.toDouble).toArray
      val dot = x.zip(y).map(t => t._1 * t._2).sum
      val expect = dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      assert(math.abs(c - expect) < 1e-12)
    }
  }

  test("bruteForceTopK: exact against in-process ranking") {
    val queries = emb.where(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val a = x.map(_.toDouble).toArray; val b = y.map(_.toDouble).toArray
      val d = a.zip(b).map(t => t._1 * t._2).sum
      val r = d / (math.sqrt(a.map(v => v * v).sum) * math.sqrt(b.map(v => v * v).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = all.toMap
    (0L until 5L).foreach { q =>
      val expect = all.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val mine = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(mine == expect, s"query $q: $mine vs $expect")
    }
  }

  test("lshTopK: recall >= 0.6 vs brute force at k=10") {
    val queries = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // fixture embeddings are near-random (max pairwise cosine ~0.5), so
    // top-k neighbors are weak (~0.3): SRP needs short signatures to collide
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10,
      bits = 4, tables = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    // approx results must be a valid scoring (cosine present, ranked)
    assert(approx.nonEmpty)
  }

  test("embeddingPairsExact == embeddingPairsLsh recall check at low threshold") {
    val exact = Dedup.embeddingPairsExact(emb.limit(200), "vec_id", "embedding", 0.35)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should have some pairs >= 0.35")
    val lsh = Dedup.embeddingPairsLsh(emb.limit(200), "vec_id", "embedding", 0.35,
      bits = 4, tables = 16)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // verification step guarantees precision 1.0
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("dedupParagraphs: first occurrence wins, docs reassemble in order") {
    val df = Seq(
      (1L, "intro|shared footer|body one"),
      (2L, "body two|shared footer|intro"), // both paras already seen in doc 1
      (3L, "shared footer"), // fully boilerplate → empty
      (4L, "body two|body two")) // duplicate within doc 2's claim + self-dup
      .toDF("id", "text")
    val got = Dedup.dedupParagraphs(df, "id", "text", "|")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "intro|shared footer|body one", 3L, 0L),
      (2L, "body two", 1L, 2L),
      (3L, "", 0L, 1L),
      (4L, "", 0L, 2L))) // "body two" first seen at (2,0) < (4,0)
    // partitioning invariance
    val got2 = Dedup.dedupParagraphs(df.repartition(5), "id", "text", "|")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got2.toSeq == got.toSeq)
  }

  test("quality_score and doc_fingerprint behave sanely") {
    val qs = docs.select(gf.quality_score(col("text")).as("q")).as[Double].collect()
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    val fp = docs.select(gf.doc_fingerprint(col("text"), 16).as("f"),
      gf.doc_fingerprint(concat(col("text"), lit(" extra trailing suffix")), 16).as("f2"))
    // fingerprint = min rolling hash: appending text can only lower/keep it
    fp.collect().foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("components: connected clusters with singletons preserved (both tiers)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (3L, 4L))
      .toDF("idA", "idB")
    val ids = (1L to 30L).toDF("id")
    // threshold 0 forces the distributed label-propagation tier; the default
    // takes the driver-side union-find tier — identical contract
    for (thresh <- Seq(1 << 20, 0)) {
      val comp = Dedup.components(pairs, allIds = Some(ids),
        localEdgeThreshold = thresh).as[(Long, Long)].collect().toMap
      assert(Seq(1L, 2L, 3L, 4L).map(comp) == Seq(1L, 1L, 1L, 1L))
      assert(Seq(10L, 11L).map(comp) == Seq(10L, 10L))
      assert(Seq(20L, 21L, 22L).map(comp) == Seq(20L, 20L, 20L))
      assert(comp(15L) == 15L && comp(30L) == 30L) // singletons
      // long chain (worst case for propagation count)
      val chain = (0L until 40L).map(i => (i, i + 1)).toDF("idA", "idB")
      val cc = Dedup.components(chain, localEdgeThreshold = thresh)
        .as[(Long, Long)].collect().toMap
      assert((0L to 40L).forall(cc(_) == 0L))
    }
  }

  test("ivf: assignment deterministic; search recall vs brute force") {
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nCenters = 16)
    assert(idx.codebook.size == 16)
    // assignment is a pure function: same result on reshuffled input
    val a1 = idx.assigned.select("vec_id", "centroid").as[(Long, Int)].collect().toMap
    val idx2 = Similarity.ivfBuild(emb.repartition(7), "vec_id", "embedding", nCenters = 16)
    val a2 = idx2.assigned.select("vec_id", "centroid").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
    val queries = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // near-random fixture vectors spread over all cells: probe most cells
    val approx = Similarity.ivfTopK(idx, queries, "vec_id", "embedding", 10, nProbe = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"ivf recall $recall")
    // full probe == exact (IVF with nProbe = nCenters degenerates to brute force)
    val full = Similarity.ivfTopK(idx, queries, "vec_id", "embedding", 10, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("cleanCorpus: quality filter + exact dedup + near-dup removal") {
    val base = docs.select(col("doc_id"), col("text"))
    val exactDup = base.limit(20).select((col("doc_id") + 10000).as("doc_id"),
      concat(lit("  "), col("text")).as("text"))  // normalized-equal copies
    val nearDup = base.limit(40).select((col("doc_id") + 20000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    val junk = Seq((30001L, "x"), (30002L, "!!!! ???? ....")).toDF("doc_id", "text")
    val corpus = base.union(exactDup).union(nearDup).union(junk)

    val (cleaned, report) = Pipeline.cleanCorpus(corpus, "doc_id", "text",
      minQuality = 0.3, jaccardThreshold = 0.5, shingleN = 3)
    assert(report.input == 500 + 20 + 40 + 2)
    assert(report.afterQuality == 560) // junk dropped
    assert(report.afterExact == 540)   // exact copies collapse to originals
    assert(report.afterNearDup <= 500) // near-dups collapse
    assert(cleaned.columns.contains("quality"))
    // originals preferred (min id per cluster)
    assert(cleaned.agg(max("doc_id")).head().getLong(0) < 10000)
    assert(cleaned.count() == report.afterNearDup)
  }

  test("minhashPairsAcross: cross-frame matches only, exact jaccard") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val old = Seq(
      (1L, base),
      (2L, "unrelated totally different words entirely here now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota NEW")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, base),                                  // exact dup of old 1
      (102L, "nothing shared with anything at all"), // clean
      (103L, base)                                   // dup of old 1 AND fresh 101
    ).toDF("doc_id", "text")
    val got = Dedup.minhashPairsAcross(fresh, old, "doc_id", "text",
        shingleN = 2, threshold = 0.5)
      .orderBy("idA", "idB")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // fresh 101/103 each match old 1 (j=1.0) and old 3 (8/10 shared bigrams
    // → j = 8/(9+9-8) = 0.8); the fresh-fresh dup (101,103) must NOT appear
    assert(got.toSeq == Seq((101L, 1L, 1.0), (101L, 3L, 0.8),
      (103L, 1L, 1.0), (103L, 3L, 0.8)))
  }

  test("keepBest: score wins over min-id, ties break to the smaller id") {
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (4L, 7L), (9L, 3L))
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (9L, 9L))
      .toDF("id", "component")
    val got = Dedup.keepBest(docs, "doc_id", clusters, "score")
      .orderBy("component")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    // cluster 1: ids 2 and 3 tie at 50 → 2 wins; singletons keep themselves
    assert(got.toSeq == Seq((1L, 2L, 50L), (4L, 4L, 7L), (9L, 9L, 3L)))
  }

  test("keepBest: string ids tie-break deterministically (no numeric cast)") {
    val docs = Seq(("b", 50L), ("a", 50L), ("c", 10L), ("z", 7L))
      .toDF("doc_id", "score")
    val clusters = Seq(("a", "a"), ("b", "a"), ("c", "a"), ("z", "z"))
      .toDF("id", "component")
    val got = Dedup.keepBest(docs, "doc_id", clusters, "score")
      .orderBy("component")
      .collect().map(r => (r.getString(2), r.getString(0), r.getLong(1)))
    // tie at 50 between "a" and "b" → lexicographically smaller "a" wins
    assert(got.toSeq == Seq(("a", "a", 50L), ("z", "z", 7L)))
    // and a non-numeric score column fails fast instead of nulling out
    val bad = docs.withColumn("score", col("score").cast("string"))
    intercept[IllegalArgumentException] {
      Dedup.keepBest(bad, "doc_id", clusters, "score")
    }
  }

  test("prepareCorpus: strip→dedup→decontaminate→mixture, every stage drops") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8" // 8-token leak from the eval set
    val corpus = Seq(
      (1L, s"<p>alpha beta gamma</p>", "a"),
      (2L, s"<b>alpha   BETA gamma</b>", "a"),    // dup of 1 after strip+normalize
      (3L, s"<p>$run tail</p>", "a"),             // contaminated
      (4L, "<p>delta epsilon</p>", "a"),
      (5L, "<p>zeta eta theta</p>", "b"),
      (6L, "<p>iota kappa</p>", "b"),
      (7L, "<p>lambda mu</p>", "c")               // source absent from targets
    ).toDF("doc_id", "text", "source")
    val bench = Seq((100L, run)).toDF("doc_id", "text")
    val (sampled, rep) = Pipeline.prepareCorpus(corpus, bench,
      "doc_id", "text", "source",
      Seq("a" -> 1.0, "b" -> 1.0), totalRows = 2L)
    assert(rep == Pipeline.PrepareReport(7, 6, 5, 2)) // -dup, -leak, quota 1+1
    val kept = sampled.select("doc_id").as[Long].collect().toSet
    assert(kept.size == 2 && !kept.contains(3L) && !kept.contains(7L))
    // text column came out stripped
    val texts = sampled.select("text").as[String].collect()
    assert(texts.forall(t => !t.contains("<") && !t.contains(">")))
  }

  test("components handles empty pair sets; cleanCorpus survives clean corpora") {
    val empty = Seq.empty[(Long, Long)].toDF("idA", "idB")
    val ids = (1L to 5L).toDF("id")
    val comp = Dedup.components(empty, allIds = Some(ids))
      .as[(Long, Long)].collect().toMap
    assert(comp == (1L to 5L).map(i => i -> i).toMap) // all singletons
    // no near-dups above threshold 0.99 → empty pair set inside the pipeline
    val (cleaned, report) = Pipeline.cleanCorpus(
      docs.select("doc_id", "text"), "doc_id", "text",
      minQuality = 0.0, jaccardThreshold = 0.99)
    assert(report.afterNearDup == report.afterExact)
    assert(cleaned.count() == report.afterNearDup)
  }

  test("components works with string ids (both tiers)") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("idA", "idB")
    for (thresh <- Seq(1 << 20, 0)) {
      val comp = Dedup.components(pairs, localEdgeThreshold = thresh)
        .as[(String, String)].collect().toMap
      assert(comp("a") == "a" && comp("b") == "a" && comp("c") == "a")
      assert(comp("x") == "x" && comp("y") == "x")
    }
  }

  test("nearest_centroids: NaN vector falls back to distinct probe indices") {
    import graft.api.{functions => gf}
    val bad = Seq((1L, Seq(Float.NaN, 1.0f, 2.0f))).toDF("id", "v")
    val codebook = typedLit(Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.0, 0.0, 1.0)))
    val probes = bad.select(gf.nearest_centroids(col("v"), codebook, 3))
      .head().getSeq[Int](0)
    assert(probes.toSet.size == 3, s"probes must be distinct: $probes")
  }

  test("splitLeakage: only cross-split near-dup pairs survive") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base, "train"),
      (2L, base + " mu", "test"),              // near-dup of 1, straddles
      (3L, base + " nu", "train"),             // near-dup of 1, same split
      (4L, "completely different words here about other topics entirely", "val"),
      (5L, base + " mu xi", "val")             // near-dup chain into val
    ).toDF("doc_id", "text", "split")
    val got = Pipeline.splitLeakage(corpus, "doc_id", "text", "split",
        shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSet
    // (1,3) is within-train → excluded; 4 matches nothing
    assert(got.map(t => (t._1, t._2)) == Set((1L, 2L), (1L, 5L), (2L, 5L), (2L, 3L), (3L, 5L)))
    got.foreach { case (_, _, sa, sb) => assert(sa != sb) }
    // a clean (single-split) corpus reports nothing
    val clean = corpus.withColumn("split", lit("train"))
    assert(Pipeline.splitLeakage(clean, "doc_id", "text", "split",
      shingleN = 2, threshold = 0.5).count() == 0L)
  }

  test("leakFreeSplit: non-train members of leaking pairs dropped") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base), (2L, base + " mu"), (3L, base + " nu"),
      (4L, "completely different words here about other topics entirely"),
      (5L, base + " mu xi")).toDF("doc_id", "text")
    // force a known assignment by driving hashSplit first and reusing it
    val assigned = Sampling.hashSplit(corpus, col("doc_id"),
      Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
    val splitOf = assigned.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val got = Pipeline.leakFreeSplit(corpus, "doc_id", "text",
        Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2),
        shingleN = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // same assignment for the survivors
    got.foreach { case (id, sp) => assert(splitOf(id) == sp) }
    // reference: pairs among {1,2,3,5} (4 matches nothing); drop the
    // non-train side of every cross-split pair
    val dupIds = Set(1L, 2L, 3L, 5L)
    val wantDropped = (for {
      a <- dupIds; b <- dupIds if a < b && splitOf(a) != splitOf(b)
      d <- Seq(a, b) if splitOf(d) != "train"
    } yield d).toSet
    assert(got.keySet == corpus.collect().map(_.getLong(0)).toSet -- wantDropped)
    // doc 4 (no near-dup) always survives
    assert(got.contains(4L))
  }

  test("pairCrossTab: orientation-normalized label-pair counts, nulls dropped") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("idA", "idB")
    val labels = Seq(
      (1L, "srcX"), (2L, "srcY"),     // X↔Y
      (3L, "srcY"), (4L, "srcX"),     // Y↔X — same cell after normalization
      (5L, "srcX"), (6L, "srcX"),     // within-X
      (7L, "srcZ"), (8L, null.asInstanceOf[String])  // dropped
    ).toDF("doc_id", "src")
    val got = Dedup.pairCrossTab(pairs, labels, "doc_id", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("srcX", "srcY") -> 2L, ("srcX", "srcX") -> 1L))
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-text safe") {
    import spark.implicits._
    val old = Seq(
      (1L, "same text"), (2L, "will change"), (3L, "will be removed"),
      (5L, null.asInstanceOf[String]),       // null text, persists
      (6L, null.asInstanceOf[String])        // null → text (changed)
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same text"), (2L, "has changed"), (4L, "brand new"),
      (5L, null.asInstanceOf[String]),
      (6L, "now has text")
    ).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"))
    // diff against self: everything unchanged
    val self = Dedup.snapshotDiff(old, old, "doc_id", "text")
      .select("status").distinct().collect().map(_.getString(0)).toSeq
    assert(self == Seq("unchanged"))
  }
}
