package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (test scope): order-of-magnitude scale measurements for the
  * round-4 operator families on synthetic data ~10–100× the sf0.1
  * fixtures. Deterministic generation (id arithmetic, no RNG) so runs are
  * comparable; numbers land in SURVEY §8.2.
  *
  * Usage: sbt "Test/runMain graft.tools.ScaleProbe [nDocs] [nVecs] [labelFilter]"
  * (labelFilter: only probes whose label contains the substring run)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nVecs = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val labelFilter = args.drop(2).headOption.getOrElse("")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.api.GraftFunctions.register(spark)
    import spark.implicits._

    def time[A](label: String)(f: => A): Unit =
      if (labelFilter.isEmpty || label.contains(labelFilter)) {
        val t0 = System.nanoTime()
        f
        println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      }
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // ~30-token docs from id arithmetic; every 97th doc quotes an 8-token
    // run that also appears in the bench set (plants contamination)
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), ((col("id") * 31 + j * 7) % 5000).cast("string"))): _*)
        .as("text"),
      concat(lit("s"), (col("id") % 20).cast("string")).as("source"))
      .withColumn("text", when(col("doc_id") % 97 === 0,
        concat(lit("b1 b2 b3 b4 b5 b6 b7 b8 "), col("text")))
        .otherwise(col("text")))
    val bench = spark.range(10000).select(col("id").as("doc_id"),
      concat(lit("b1 b2 b3 b4 b5 b6 b7 b8 tail"),
        col("id").cast("string")).as("text"))

    println(s"== ScaleProbe: nDocs=$nDocs nVecs=$nVecs (local[32]) ==")
    time(s"generate+count corpus") { docs.count() }

    val page = concat(lit("<html><head><style>p{m:0}</style></head><body><p>"),
      col("text"), lit("</p><script>var x = 1;</script></body></html>"))
    time(s"stripHtml $nDocs docs (regex chain)") {
      force(docs.select(graft.ops.Text.stripHtml(page).as("t")))
    }

    time(s"decontaminate $nDocs vs 10k bench") {
      force(graft.ops.Decontaminate.sharedSpans(docs, bench, "doc_id", "text",
        windowTokens = 8, minShared = 1))
    }

    time(s"mixtureSample $nDocs -> 1M (20 sources)") {
      force(graft.ops.Sampling.mixtureSample(docs, col("source"),
        col("doc_id"), (0 until 20).map(i => s"s$i" -> 1.0), 1000000L))
    }

    time(s"dedupParagraphs $nDocs (sep=' ', 30 paras/doc)") {
      force(graft.ops.Dedup.dedupParagraphs(docs, "doc_id", "text", " "))
    }

    val lmDocs = docs.where(col("doc_id") % 5 === 0)
    time(s"LM trigram scoreSelf ${nDocs / 5} docs") {
      force(graft.ops.LangModel.scoreSelf(lmDocs, "doc_id", "text"))
    }

    time(s"bm25 postings+search ${nDocs / 5} docs, 10 queries") {
      force(graft.ops.Text.bm25TopK(lmDocs,
        lmDocs.where(col("doc_id") < 50), "doc_id", "text", 10))
    }

    time(s"BPE learnMerges k=8 over $nDocs docs") {
      graft.ops.Bpe.learnMerges(docs, "text", 8)
    }

    // sharedRuns: every 500th doc carries one of 100 distinct 12-token
    // blocks (→ ~nDocs/500/100 docs per block, well under the hot-span
    // guard; the 51k-doc "b1..b8" boilerplate run IS over it and must be
    // guard-dropped). Measures span emission + occurrence filter over
    // ~23·nDocs positional spans plus the diagonal-island window on the
    // matched tail.
    val runDocs = docs.withColumn("text",
      when(col("doc_id") % 500 === 0,
        concat(concat_ws(" ", (0 until 12).map(j =>
          concat(lit("r"), (col("doc_id") / 500 % 100).cast("string"),
            lit("_" + j))): _*), lit(" "), col("text")))
        .otherwise(col("text")))
    time(s"sharedRuns $nDocs docs (8-token windows)") {
      println("  runs=" + graft.ops.Dedup.sharedRuns(runDocs, "doc_id",
        "text", windowTokens = 8, maxDocsPerSpan = 1000).count())
    }

    // embeddings: 64-dim unit-ish vectors from id arithmetic
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => ((col("id") * 37 + d * 11) % 1000).cast("float") / 1000.0f - 0.5f)
        .as("embedding"))
    val base = vecs.where(col("vec_id") < 8)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val cbs: graft.ops.Similarity.PqCodebooks =
      (0 until 4).map(i => base.map(v => v.slice(i * 16, i * 16 + 16)))
    time(s"pqEncode $nVecs x 64-dim (m=4)") {
      force(vecs.select(col("vec_id"),
        graft.ops.Similarity.pqEncode(col("embedding"), cbs, 16).as("codes")))
    }
    val encoded = vecs.select(col("vec_id"),
      graft.ops.Similarity.pqEncode(col("embedding"), cbs, 16).as("codes"))
    time(s"pqAdcScores $nVecs rows, 5 queries") {
      force(graft.ops.Similarity.pqAdcScores(encoded,
        vecs.where(col("vec_id") < 5), "vec_id", "embedding", "codes", cbs, 16))
    }

    // SemDeDup probe: k ≈ √n clusters (the paper's sizing) bounds the
    // within-cluster quadratic work; 100k vectors / 256 clusters ≈ 20M
    // cosine evaluations
    val semBase = vecs.where(col("vec_id") < 256)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val semCorpus = vecs.where(col("vec_id") % 20 === 0)
    time(s"semanticPairs ${nVecs / 20} vecs (256 clusters, tau=0.9)") {
      println("  pairs=" + graft.ops.Similarity.semanticPairs(
        semCorpus, "vec_id", "embedding", semBase, 0.9).count())
    }

    // round-6 ops ------------------------------------------------------

    // link graph: nDocs edges over ~100k domain nodes (power-ish skew via
    // modular squares: low ids collect many in-links)
    val edges = spark.range(nDocs).select(
      concat(lit("d"), (col("id") % 100000).cast("string")).as("src"),
      concat(lit("d"), ((col("id") * col("id") + 7) % 100000).cast("string"))
        .as("dst"))
    time(s"pageRank $nDocs edges / 100k nodes, 5 iters") {
      force(graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5))
    }

    // blocklist: 1000 patterns, one AC pass over the full corpus
    val blockPats = (0 until 1000).map(i => s"w${(i * 17) % 5000} w${(i * 29) % 5000}")
    time(s"blocklist matchStats $nDocs docs x 1000 patterns") {
      force(graft.ops.Blocklist.matchStats(docs, "text", blockPats))
    }

    // fuzzy join: 13-char hash-derived strings (realistic sparsity: random
    // hex ≈ no coincidental near-pairs); ids 2k/2k+1 share a base and
    // differ in the last char — nFuzzy/2 planted dist-1 pairs
    val nFuzzy = math.min(nDocs / 5, 1000000L)
    val fuzzyBase = spark.range(nFuzzy).select(col("id"),
      concat(substring(md5((col("id") - col("id") % 2).cast("string")), 1, 12),
        when(col("id") % 2 === 0, lit("a")).otherwise(lit("b"))).as("s"))
    time(s"editDistancePairs $nFuzzy strings tau=1") {
      println("  pairs=" + graft.ops.Fuzzy.editDistancePairs(
        fuzzyBase, "id", "s", maxDist = 1).count())
    }

    // boilerplate: paragraph frequencies over the full corpus ('w0 '
    // prefixed docs share their first paragraphs heavily)
    time(s"removeFrequentParagraphs $nDocs docs") {
      force(graft.ops.Text.removeFrequentParagraphs(docs, "doc_id", "text",
        sep = " w", minDocs = 1000))
    }

    // round-6 eval/robust ops -------------------------------------------

    // scored corpus: exact-rational score, modular label, ~40k distinct
    // scores so the AUC grouping genuinely compresses
    val scored = spark.range(nDocs).select(col("id"),
      (((col("id") * 37 + 5) % 40960).cast("double") / 40960.0).as("s"),
      ((col("id") * 2654435761L) % 100 < 37).as("y"),
      concat(lit("s"), (col("id") % 20).cast("string")).as("source"))
    time(s"exact AUC $nDocs rows (40k distinct scores)") {
      force(graft.ops.Eval.auc(scored, col("s"), col("y")))
    }
    time(s"aucByGroup $nDocs rows x 20 sources") {
      force(graft.ops.Eval.aucByGroup(scored, Seq("source"), col("s"),
        col("y")))
    }
    time(s"prAtThresholds $nDocs rows x 9 taus") {
      force(graft.ops.Eval.prAtThresholds(scored, col("s"), col("y"),
        (1 to 9).map(_ / 10.0)))
    }
    time(s"logisticFit $nDocs rows, 2 features, 5 iters") {
      graft.ops.Classify.logisticFit(scored,
        Seq(col("s"), (col("id") % 7).cast("double") / 8.0), col("y"),
        iterations = 5, lr = 0.5)
    }
    time(s"robustZ sketch $nDocs rows x 20 groups") {
      force(graft.ops.Robust.robustZ(scored, Seq("source"), col("s"), "z",
        approx = true))
    }
    time(s"quantileBand sketch $nDocs rows x 20 groups") {
      force(graft.ops.Robust.quantileBand(scored, Seq("source"), col("s"),
        0.05, 0.95, approx = true))
    }

    // round-6 drift ops at token scale: the 30-token docs make the corpus
    // 30·nDocs tokens (nDocs=33M → ~1B tokens, 5k-token vocabulary); all
    // three ops reduce to ONE (group/side, token) count shuffle, so the
    // post-count grids are corpus-size independent
    time(s"tokenDrift ${30 * nDocs} tokens (5k vocab)") {
      force(graft.ops.Drift.tokenDrift(docs, col("text"),
        col("doc_id") % 2 === 0))
    }
    time(s"jsMatrix ${30 * nDocs} tokens x 20 sources") {
      force(graft.ops.Drift.jsMatrix(
        docs.select(explode(split(col("text"), " ")).as("tok"), col("source")),
        col("tok"), col("source")))
    }
    // round-8 ops ------------------------------------------------------

    time(s"vocabCoverage ${30 * nDocs} tokens (5k vocab)") {
      force(graft.ops.Vocab.coverage(docs, col("text"),
        Seq(100L, 1000L, 5000L)))
    }
    time(s"vocabEncode $nDocs docs (5k vocab, minCount=100)") {
      val v = graft.ops.Vocab.build(docs, col("text"), minCount = 100)
      force(graft.ops.Vocab.encode(docs, "doc_id", col("text"), v))
    }
    time(s"bpeEncode $nDocs docs (8 merges, ${30 * nDocs} tokens)") {
      // merges fixed (not learned here — learning is k vocab-table passes,
      // probed by the q89 path); this measures the ENCODE composition:
      // type-table segmentation + word join + sorted streaming assembly
      val merges = Seq(graft.ops.Bpe.Merge("w", "1", 0),
        graft.ops.Bpe.Merge("w1", "0", 0), graft.ops.Bpe.Merge("w", "2", 0),
        graft.ops.Bpe.Merge("w", "3", 0), graft.ops.Bpe.Merge("w", "4", 0),
        graft.ops.Bpe.Merge("1", "1", 0), graft.ops.Bpe.Merge("2", "2", 0),
        graft.ops.Bpe.Merge("w1", "1", 0))
      force(graft.ops.Bpe.encode(docs, "doc_id", col("text"), merges))
    }
    time(s"filterFunnel $nDocs docs x 4 rules") {
      force(graft.ops.Pipeline.filterFunnel(docs, Seq(
        "min_len" -> (length(col("text")) >= 50),
        "max_len" -> (length(col("text")) <= 500),
        "digit_ratio" ->
          (length(regexp_replace(col("text"), "[^0-9]", "")) * 2
            <= length(col("text"))),
        "min_tokens" -> (size(split(col("text"), " ")) >= 10))))
    }
    time(s"sqQuantize $nVecs x 64-dim") {
      val r = graft.ops.Similarity.sqRanges(vecs, col("embedding"))
        .orderBy("dim").collect()
      val lo = r.map(_.getDouble(1)).toSeq
      val hi = r.map(_.getDouble(2)).toSeq
      force(vecs.select(col("vec_id"),
        graft.ops.Similarity.sqQuantize(col("embedding"), lo, hi).as("codes")))
    }
    time(s"sqTopK $nVecs rows, 5 queries") {
      val r = graft.ops.Similarity.sqRanges(vecs, col("embedding"))
        .orderBy("dim").collect()
      val lo = r.map(_.getDouble(1)).toSeq
      val hi = r.map(_.getDouble(2)).toSeq
      val coded = vecs.select(col("vec_id"),
        graft.ops.Similarity.sqQuantize(col("embedding"), lo, hi).as("codes"))
      force(graft.ops.Similarity.sqTopK(coded,
        vecs.where(col("vec_id") < 5), "vec_id", "codes", "embedding",
        lo, hi, 10))
    }

    time(s"spearman $nDocs rows (40k x 97 distinct — broadcast ranks)") {
      force(graft.ops.Profile.spearman(
        docs.select(((col("doc_id") * 2654435761L) % 40000).cast("double")
            .as("x"), ((col("doc_id") * 31) % 97).cast("double").as("y")),
        col("x"), col("y")))
    }
    time(s"spearman $nDocs rows (~all-distinct x — corpus-sized ranks)") {
      force(graft.ops.Profile.spearman(
        docs.select((col("doc_id") * 2654435761L % 999999937L)
            .cast("double").as("x"),
          ((col("doc_id") * 31) % 97).cast("double").as("y")),
        col("x"), col("y")))
    }
    time(s"pca covMoments $nVecs x 64-dim (GramAgg fold)") {
      force(graft.ops.Similarity.covarianceMatrix(vecs, col("embedding")))
    }
    time(s"classifierReport $nDocs rows x 20 classes") {
      force(graft.ops.Eval.classifierReport(
        docs.select(col("source").as("l"),
          when(col("doc_id") % 3 === 0,
            concat(lit("s"), ((col("doc_id") + 1) % 20).cast("string")))
            .otherwise(col("source")).as("p")),
        col("l"), col("p")))
    }
    time(s"hammingPairs ${nDocs / 5} uniform fingerprints (chunks=4)") {
      // uniform 64-bit fps are the ADVERSARIAL case for 16-bit bands:
      // candidate volume ~ 4·n²/2^16 — hammingPairsAdaptive (below)
      // detects this and switches tiers; real simhash corpora are far
      // from uniform
      force(graft.ops.Dedup.hammingPairs(
        docs.where(col("doc_id") < nDocs / 5)
          .select(col("doc_id"),
            graft.api.functions.hash64(col("doc_id")).as("fp")),
        "doc_id", "fp", maxHamming = 3, chunks = 4))
    }
    time(s"hammingPairsAdaptive ${nDocs / 5} uniform fps (auto two-level)") {
      // same adversary through the estimate → multi-index path: the
      // 28-bit composite keys cut uniform buckets by ~2^12
      force(graft.ops.Dedup.hammingPairsAdaptive(
        docs.where(col("doc_id") < nDocs / 5)
          .select(col("doc_id"),
            graft.api.functions.hash64(col("doc_id")).as("fp")),
        "doc_id", "fp", maxHamming = 3, chunks = 4))
    }

    time(s"windowedDrift $nDocs events x 30 days") {
      force(graft.ops.Drift.windowedDrift(
        docs.select(col("doc_id"),
          timestamp_micros(lit(1700000000000000L) +
            (col("doc_id") % 30) * 86400000000L).as("ts"),
          concat(lit("t"), (col("doc_id") % 500).cast("string")).as("cat")),
        col("ts"), col("cat"), "1 day"))
    }

    time(s"normalizeText $nDocs docs") {
      force(docs.select(col("doc_id"),
        graft.api.functions.normalize_text(col("text")).as("t")))
    }

    time(s"dsir weights $nDocs docs B=1048576") {
      // target = 5% slice; the 1M-bucket ratio table broadcasts (~tens of
      // MB) — the corpus ships only (id, bucket) pairs into exact_sum
      force(graft.ops.Dsir.importanceWeights(docs,
        docs.where(col("doc_id") % 20 === 0), "doc_id", "text",
        buckets = 1 << 20, alpha = 0.5, bigrams = true))
    }

    time("hits 100k nodes / 1M edges x 5 iters") {
      val edges = spark.range(1000000L).select(
        concat(lit("n"), (col("id") % 100000).cast("string")).as("src"),
        concat(lit("n"), ((col("id") * 7 + 13) % 100000).cast("string"))
          .as("dst"))
      force(graft.ops.Graph.hits(edges, "src", "dst", iterations = 5))
    }

    time(s"rankBlend 3 near-continuous signals x $nDocs") {
      // (id*2654435761)%1e9 gives ~nDocs distinct values per signal —
      // corpus-sized rank tables, the documented exact-rank worst case
      force(graft.ops.Quality.rankBlend(
        docs.select(col("doc_id"),
          ((col("doc_id") * 2654435761L) % 1000000000L).as("a"),
          ((col("doc_id") * 1103515245L + 12345L) % 1000000000L).as("b"),
          (col("doc_id") % 1000).as("c")),
        "doc_id", Seq(("a", col("a"), true), ("b", col("b"), true),
          ("c", col("c"), false))))
    }

    time(s"hll grouped p=14 over $nDocs rows x 20 groups") {
      force(docs.groupBy("source").agg(
        graft.api.functions.hll_distinct(
          graft.api.functions.hll_agg(col("doc_id"), 14)).as("d")))
    }

    time(s"spanCorrupt $nDocs docs (~${30 * nDocs} tokens, 256 parts)") {
      // the exploded (doc, pos, token) frame rides ONE hash(doc) shuffle
      // whose partitions must hold their docs' token rows: at 32
      // partitions a 990M-token corpus is ~31M rows/partition and OOMs
      // an 8 GB heap — size shuffle partitions to the token volume
      // (~4M rows/partition here), exactly the
      // spark.sql.shuffle.partitions / maxPartitionBytes discipline the
      // op's scaladoc prescribes
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      try force(graft.ops.Text.spanCorrupt(docs, "doc_id", col("text")))
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    time(s"chatRender $nDocs 3-turn conversations") {
      val half = floor(length(col("text")) / 2).cast("int")
      val turns = docs.select(col("doc_id"), lit(0).as("turn"),
          lit("system").as("role"), col("source").as("content"))
        .unionByName(docs.select(col("doc_id"), lit(1).as("turn"),
          lit("user").as("role"),
          col("text").substr(lit(1), half).as("content")))
        .unionByName(docs.select(col("doc_id"), lit(2).as("turn"),
          lit("assistant").as("role"),
          col("text").substr(half + 1, length(col("text")) - half)
            .as("content")))
      force(graft.ops.Chat.render(turns, "doc_id", "turn", "role",
        "content"))
    }
    time(s"bpeFertility $nDocs docs x 8 merges x 20 groups") {
      val merges = Seq(graft.ops.Bpe.Merge("w", "1", 0),
        graft.ops.Bpe.Merge("w1", "0", 0), graft.ops.Bpe.Merge("w", "2", 0),
        graft.ops.Bpe.Merge("w", "3", 0), graft.ops.Bpe.Merge("w", "4", 0),
        graft.ops.Bpe.Merge("1", "1", 0), graft.ops.Bpe.Merge("2", "2", 0),
        graft.ops.Bpe.Merge("w1", "1", 0))
      force(graft.ops.Bpe.fertilityByKey(docs, col("text"), col("source"),
        merges))
    }
    time(s"markdown+fim+readability $nDocs docs (scan-side chain)") {
      val md = graft.ops.Text.fimTransform(
        docs.select(col("doc_id"),
          graft.ops.Text.stripMarkdown(
            concat(lit("# T\n\n- a\n\n"), col("text"))).as("text")),
        "doc_id", col("text"))
      force(graft.ops.Text.readability(md, col("out_text")))
    }

    time(s"bleu ${nDocs / 5} pairs (~${6 * nDocs} tokens, n<=4)") {
      // candidate = every 10th token hash-dropped; the (pair, n, gram)
      // union shuffle carries ~8x the token volume — the honest cost of
      // clipped n-gram precision, measured
      val sub = docs.where(col("doc_id") % 5 === 0)
      val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
      val cand = array_join(transform(
        filter(transform(toks, (t, i) => struct(t.as("t"), i.as("i"))),
          st => pmod(graft.api.functions.hash64(
            concat(col("doc_id"), lit(":"), st.getField("i"))),
            lit(10)) =!= 0),
        st => st.getField("t")), " ")
      force(graft.ops.Eval.bleu(
        sub.select(col("doc_id"), col("source"), col("text"),
          cand.as("cand")),
        "doc_id", col("text"), col("cand"), Seq("source"), 4))
    }
    time(s"winnowPairs ${nDocs / 5} docs (5000-way planted dup groups)") {
      // the synthetic text repeats every 5000 ids -> each doc has
      // nDocs/25000 exact replicas; winnow fps shared by the whole group
      // (df <= 256 cap holds at the default probe size), so the pair
      // aggregation materializes the full duplicate clique — the
      // worst-case shape dedup exists to find. The %97 planted prefix
      // fps exceed the df cap and are dropped (boilerplate path).
      force(graft.ops.Dedup.winnowPairs(docs.where(col("doc_id") % 5 === 0),
        "doc_id", col("text"), k = 24, window = 16, minShared = 2,
        maxDocFreq = 256))
    }
    time(s"metricReplicates 32 x $nDocs") {
      force(graft.ops.Eval.metricReplicates(docs, col("doc_id"),
        length(col("text")), 32))
    }
    time(s"fleissKappa ${nDocs / 5} items x 5 raters") {
      val rated = docs.where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0), lit(4))).as("r"))
        .withColumn("cat", when(pmod(graft.api.functions.hash64(
            concat(col("doc_id"), lit(":"), col("r"))), lit(10)) < 7,
          col("source")).otherwise(lit("alt")))
      force(graft.ops.Eval.fleissKappa(rated, col("doc_id"), col("cat")))
    }
    time(s"embeddingOutliers $nVecs x 64d (16 groups)") {
      force(graft.ops.Similarity.embeddingOutliers(vecs, "vec_id",
        pmod(col("vec_id"), lit(16)), col("embedding")))
    }

    // round-10 ops -----------------------------------------------------

    time(s"r10 bpeEncode $nDocs docs, k=1000 merges (chunked fold)") {
      // production-scale merge table: 1000 merges over the synthetic
      // w<digits> vocabulary, all of which actually fire. The fold runs
      // 63 chunked checkpoint rounds over the word-TYPE table (5000
      // rows); the measured cost is fold machinery + the corpus-scale
      // encode assembly — the k >> 8 regime q171 never exercises.
      val digits = (0 to 9).map(_.toString)
      val merges =
        (digits.map(d => graft.ops.Bpe.Merge("w", d, 0)) ++
          (for (a <- digits; b <- digits)
            yield graft.ops.Bpe.Merge("w" + a, b, 0)) ++
          (for (a <- digits; b <- digits; c <- digits)
            yield graft.ops.Bpe.Merge("w" + a + b, c, 0))).take(1000)
      force(graft.ops.Bpe.encode(docs, "doc_id", col("text"), merges))
    }
    time(s"r10 unigram learn $nDocs docs (vocab 2000, 2 EM iters)") {
      graft.ops.Unigram.learn(docs, col("text"), vocabSize = 2000,
        maxPieceLen = 4, minCount = 2, seedCap = 4000, emIters = 2)
    }
    time(s"r10 unigram encode $nDocs docs (vocab 2000)") {
      val m = graft.ops.Unigram.learn(docs, col("text"), vocabSize = 2000,
        maxPieceLen = 4, minCount = 2, seedCap = 4000, emIters = 2)
      force(graft.ops.Unigram.encode(docs, "doc_id", col("text"), m))
    }
    time(s"r10 packFitWhole $nDocs docs (budget 128)") {
      force(graft.ops.Packing.packFitWhole(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok")),
        "doc_id", "n_tok", 128L))
    }
    time(s"r10 heldOutReport $nDocs docs (trigram, 20 groups)") {
      force(graft.ops.LangModel.heldOutReport(docs, "doc_id", "text",
        Seq("source")))
    }

    // round-11 ops -----------------------------------------------------

    time(s"r11 wordpiece learnMerges k=1000, $nDocs docs") {
      // production-k WordPiece TRAINING: k driver-coordinated rounds,
      // each = symbol-count shuffle + likelihood-scored pair argmax +
      // fold/checkpoint, ALL over the word-TYPE table (5000 types here —
      // corpus size only enters through the one wordCounts pass). The
      // question this probe answers: does the per-round argmax collect
      // become a driver bottleneck at k=1000 (the q207 gate only runs
      // k=6)? The synthetic w<digits> vocabulary sustains >1000 merges
      // (every distinct word prefix is one fusable pair).
      val m = graft.ops.Wordpiece.learnMerges(docs, "text", 1000)
      require(m.size == 1000, s"exhausted at ${m.size}")
    }

    time(s"r11 bpe learnMerges SEQUENTIAL k=256, $nDocs docs") {
      // the round-latency baseline the batched trainer amortizes:
      // one pair-count shuffle + argmax collect + fold PER MERGE
      val m = graft.ops.Bpe.learnMerges(docs, "text", 256)
      require(m.size == 256, s"exhausted at ${m.size}")
    }
    time(s"r11 bpe learnMergesBatched k=1000 batch=64, $nDocs docs") {
      // same corpus, ~k/batch rounds: the production-k path q217 gates
      val m = graft.ops.Bpe.learnMergesBatched(docs, "text", 1000,
        batch = 64)
      require(m.size == 1000, s"exhausted at ${m.size}")
    }

    time(s"r11 lossless encode+decode $nDocs docs (8 byte merges)") {
      // the detokenization contract at corpus scale: whitespace-attached
      // byte encode, then full decode back to text — two corpus passes
      // for the encode assembly plus one per-row reconstruction pass
      val digits = (0 to 9).map(_.toString)
      val merges = digits.take(8).map(d => graft.ops.Bpe.Merge("w", d, 0))
      val enc = graft.ops.Bpe.encodeBytesLossless(docs, "doc_id",
        col("text"), merges)
      force(graft.ops.Bpe.decodeBytes(enc, "doc_id", "ids", merges))
    }

    time(s"r11 index append 1/10 shard onto $nDocs-doc index") {
      // the daily-crawl lifecycle cost claim: appending a shard is
      // O(shard), independent of the indexed history's size
      val dir = java.nio.file.Files
        .createTempDirectory("probe_mhidx").toString
      val t0 = System.nanoTime()
      graft.ops.Dedup.buildMinhashIndex(
        docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text", dir,
        shingleN = 3, numHashes = 64, bands = 16)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.ops.Dedup.appendToMinhashIndex(
        docs.where(col("doc_id") % 10 === 0), "doc_id", "text", dir)
      val tApp = (System.nanoTime() - t1) / 1e9
      println(f"    build 9/10: $tBuild%.1f s; append 1/10: $tApp%.1f s")
    }

    time(s"r11 ordered shards (global rank) over $nDocs docs") {
      // curriculum sharding cost: ONE range shuffle + broadcast offsets
      force(graft.sources.Shards.assignShardsOrdered(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok")),
        col("n_tok"), col("doc_id"), 1024))
    }

    // round-12 ops -----------------------------------------------------

    // id-record framing at training sequence length: the linear
    // hex-limb/array_join framing vs the old O(L²) binary fold. The fold
    // copies ~L²/2 · 8 bytes per doc (67 MB for L=4096), so it only gets
    // a 1/1000-sized run; the linear path frames the full slice.
    val longDocs = spark.range(nDocs / 100).select(col("id").as("doc_id"),
      transform(sequence(lit(0), lit(4095)),
        i => (col("id") * 31 + i).cast("long")).as("ids"))
    time(s"r12 idRecords LINEAR frame ${nDocs / 100} docs x 4096 tok") {
      force(longDocs.select(graft.sources.IdRecords.encodeRecord(
        col("doc_id"), col("ids")).as("rec")))
    }
    time(s"r12 idRecords FOLD frame ${nDocs / 100000} docs x 4096 tok") {
      def b8(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 16, "0"))
      force(longDocs.where(col("doc_id") < nDocs / 100000)
        .select(aggregate(col("ids"), b8(col("doc_id")),
          (acc, x) => concat(acc, b8(x))).as("rec")))
    }

    time(s"r12 concatChunk $nDocs docs -> 2048-token samples") {
      // GPT-style concat-and-chunk at corpus scale: one LONG-exact
      // prefix sum positions every doc, one sample-keyed shuffle
      // assembles ~30·nDocs/2048 samples
      val enc = docs.select(col("doc_id"),
        transform(sequence(lit(1), lit(30)),
          j => (col("doc_id") * 31 + j) % 5000).as("ids"))
      force(graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
        seqLen = 2048, eosId = 2L, padId = 0L))
    }

    // session-4 ops at corpus scale: prompt-keyed groups of 8 candidates
    val cand = spark.range(nDocs).select(
      call_function("div", col("id"), lit(8L)).as("prompt"),
      col("id").as("cand_id"),
      ((col("id") * 2654435761L) % 10007).cast("double").as("reward"))
    time(s"r12 groupAdvantage+LOO ${nDocs / 8} prompts x 8 cands") {
      force(graft.ops.Reward.leaveOneOutAdvantage(
        graft.ops.Reward.groupAdvantage(cand, Seq("prompt"),
          col("reward")),
        Seq("prompt"), col("reward")))
    }
    time(s"r12 poissonBootstrapCI B=64 over $nDocs rows, 20 groups") {
      force(graft.ops.Robust.poissonBootstrapCI(
        cand.withColumn("g", col("cand_id") % 20), Seq("g"),
        col("cand_id"), col("reward")))
    }
    time(s"r12 shufflePlan one-scan over $nDocs rows") {
      force(graft.ops.Planner.shufflePlan(
        cand.select((col("cand_id") % 100000).as("k")), col("k"),
        targetRowsPerTask = 1000000L))
    }

    // session-5 ops at corpus scale
    val ev5 = spark.range(nDocs).select(
      (col("id") % 100000).as("user_id"), col("id").as("event_id"),
      col("id").cast("timestamp").as("ts"),
      ((col("id") * 2654435761L) % 997).cast("double").as("value"))
    time(s"r12s5 gaeAdvantage H=16 over $nDocs events, 100k streams") {
      force(graft.ops.Reward.gaeAdvantage(ev5, Seq("user_id"),
        col("ts"), col("event_id"), col("value"),
        (col("event_id") % 16).cast("double")))
    }
    time(s"r12s5 bestOfN+passAtK+vote ${nDocs / 8} prompt groups") {
      val c8 = cand.withColumn("ok", col("reward") < 5000)
      force(graft.ops.Eval.bestOfN(c8, Seq("prompt"), col("reward"),
        Seq(1, 2, 4)))
      force(graft.ops.Eval.passAtK(c8, Seq("prompt"), col("ok"),
        Seq(1, 4)))
      force(graft.ops.Eval.majorityVote(c8, Seq("prompt"),
        (col("reward") % 7).cast("string")))
    }
    time(s"r12s5 riskCoverage+conformal 20 groups x ${nDocs / 20}") {
      val g20 = cand.withColumn("g", col("cand_id") % 20)
      force(graft.ops.Eval.riskCoverage(g20, Seq("g"), col("reward"),
        col("cand_id") % 3 === 0, col("cand_id")))
      force(graft.ops.Eval.conformalThreshold(g20, Seq("g"),
        col("reward"), col("cand_id"), Seq(0.25, 0.125)))
    }
    time(s"r12s5 padBuckets 1024 bins + kvPageStats over $nDocs") {
      val lens = cand.select((col("cand_id") % 4096).as("len"),
        col("cand_id"))
      force(graft.ops.Packing.padBuckets(lens, col("len"),
        col("cand_id"), 1024))
      force(graft.ops.Packing.kvPageStats(
        lens.withColumn("g", col("cand_id") % 20), Seq("g"),
        col("len"), 16))
    }
    time(s"r12s5 bradleyTerry 3 rounds, $nDocs duels, 20 items") {
      force(graft.ops.Preference.bradleyTerry(
        cand.select(concat(lit("s"), (col("cand_id") % 20))
            .as("w"),
          concat(lit("s"), ((col("cand_id") + col("reward")
            .cast("long")) % 20)).as("l"))
          .where(col("w") =!= col("l")),
        col("w"), col("l"), iters = 3))
    }

    time(s"r12s7 ksTest+wasserstein over $nDocs two-sided rows") {
      val two = cand.select((col("cand_id") % 4096).cast("double")
        .as("v"), (col("cand_id") % 2 === 0).as("a"))
      force(graft.ops.Drift.ksTest(two, col("v"), col("a")))
      force(graft.ops.Drift.wasserstein1(two, col("v"), col("a")))
    }
    time(s"r12s7 rankingMetrics+rrfFuse ${nDocs / 8} query groups") {
      val q8 = cand.withColumn("rel", (col("reward") < 2000).cast("int"))
        .withColumn("s2", (col("cand_id") * 2654435761L) % 9973)
      force(graft.ops.Eval.rankingMetrics(q8, Seq("prompt"),
        col("reward"), col("rel"), col("cand_id"), k = 5))
      force(graft.ops.Eval.rrfFuse(q8, Seq("prompt"), col("reward"),
        col("s2"), col("cand_id"), k = 3))
    }

    // r13: late-interaction at corpus scale. The candidate-fed scorer's
    // cost must track CANDIDATES (one corpus scan + a broadcast-hash
    // probe), never corpus x queries; the token-level first stage is the
    // expensive half and is the same sqTopK shape the ANN family probes.
    def tokenBags(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), t =>
        transform(sequence(lit(0), lit(7)), d =>
          (((col("id") * 31 + t * lit(7L) + d * lit(3L)) % 97)
            .cast("double") - lit(48.0)) / lit(48.0))).as("tv"))
    time(s"r13 maxSimTopKFrom 8 queries x 64 cands, $nVecs-doc corpus") {
      val bags = tokenBags(nVecs)
      val cand = spark.range(8).select(col("id").as("query_id"))
        .crossJoin(spark.range(64)
          .select((col("id") * (nVecs / 64) + 7).as("doc_id")))
      force(graft.ops.Similarity.maxSimTopKFrom(cand, bags,
        bags.where(col("vec_id") < 8), "vec_id", "tv", 5))
    }
    time(s"r13 token-level SQ8 first stage, ${nVecs / 4} docs x 8 tok") {
      val bags = tokenBags(nVecs / 4)
      val tok = bags.select(col("vec_id"), posexplode(col("tv")))
        .select((col("vec_id") * 8 + col("pos")).as("tok_id"),
          col("col").as("v"))
      val tr = graft.ops.Similarity.sqRanges(tok, col("v"))
        .orderBy("dim").collect()
      val lo8 = tr.map(_.getDouble(1)).toSeq
      val hi8 = tr.map(_.getDouble(2)).toSeq
      val codedTok = tok.select(col("tok_id"),
        graft.ops.Similarity.sqQuantize(col("v"), lo8, hi8).as("codes"))
      val hits = graft.ops.Similarity.sqTopKRefined(codedTok, tok,
        tok.where(col("tok_id") < 64), "tok_id", "codes", "v",
        lo8, hi8, k = 32, rerank = 96)
      force(hits.select(
          ((col("query_id") - col("query_id") % 8) / 8).cast("long")
            .as("query_id"),
          ((col("neighbor_id") - col("neighbor_id") % 8) / 8).cast("long")
            .as("doc_id"))
        .where(col("query_id") =!= col("doc_id")).distinct())
    }

    // r13 session 2: graph analytics — wedge cost is Σ_z C(deg z, 2),
    // so the probe graph pins average degree at 8 and the hub guard is
    // what keeps the shape safe when a real graph doesn't
    val nEdges = nVecs
    val nNodes = math.max(nVecs / 4, 1L)
    val bigEdges = spark.range(nEdges).select(
      ((col("id") * 2654435761L) % nNodes).as("src"),
      ((col("id") * 40503L + 3) % nNodes).as("dst"))
    time(s"r13 linkPrediction $nEdges edges, $nNodes nodes") {
      force(graft.ops.Graph.linkPrediction(bigEdges, "src", "dst"))
    }
    time(s"r13 labelPropagation 4 rounds, ${nEdges / 4} edges") {
      force(graft.ops.Graph.labelPropagation(
        bigEdges.limit((nEdges / 4).toInt), "src", "dst", 4))
    }

    // r13 session 2: sequence RL + census ops — all single-exchange
    time(s"r13 vTrace H=16, $nDocs steps x ${nDocs / 50} groups") {
      val seqs = spark.range(nDocs).select(
        (col("id") % (nDocs / 50)).as("g"), col("id").as("t"),
        (col("id") % 7).cast("double").as("r"),
        (col("id") % 16).cast("double").as("v"),
        pow(lit(2.0), (col("id") % 3 - 1).cast("double")).as("is"))
      force(graft.ops.Reward.vTrace(seqs, Seq("g"), col("t"), col("t"),
        col("r"), col("v"), col("is"), gamma = 0.5, horizon = 16))
    }
    time(s"r13 heapsFit $nDocs docs") {
      force(graft.ops.Text.heapsFit(docs, "doc_id", "text"))
    }
    time(s"r13 krippendorffAlpha ${nDocs * 3} ratings") {
      val rated = spark.range(nDocs * 3).select(
        (col("id") % nDocs).as("item"),
        concat(lit("c"), ((col("id") * 31) % 5).cast("string")).as("cat"))
      force(graft.ops.Eval.krippendorffAlpha(rated, col("item"),
        col("cat")))
    }
    time(s"r13 temporalSplit+entityOverlap $nDocs rows") {
      val ev = spark.range(nDocs).select(col("id"),
        (col("id") % 100000).as("user_id"),
        timestamp_micros(lit(1704067200000000L) +
          (col("id") * 251) % (30L * 86400000000L)).as("ts"))
      val sp = graft.ops.Sampling.temporalSplit(ev, col("ts"),
        lit("2024-01-22").cast("timestamp"), expr("INTERVAL 3 DAYS"))
      force(graft.ops.Sampling.entityOverlap(sp, col("user_id")))
    }
    // vectors must be DIVERSE (hash-derived per (id, dim)) — a small
    // shared cycle collapses every SRP bucket and the candidate join
    // explodes; 1% planted copies are what the op should find. bits
    // sized so buckets stay sparse at this corpus size (2^24 ≫ nVecs).
    time(s"r13 embeddingPairsLsh $nVecs vecs, 24 bits x 16 tables") {
      val src = (col("id") - (col("id") % 100 === 1).cast("long"))
      val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(xxhash64(src, d), lit(971L))).cast("double")
            - lit(485.0)) / lit(485.0)).as("embedding"))
      force(graft.ops.Dedup.embeddingPairsLsh(vecs, "vec_id",
        "embedding", 0.95, bits = 24, tables = 16))
    }

    time(s"hashedLogreg B=64 x 5 iters x $nDocs") {
      val withB = docs.select(col("doc_id"),
          graft.ops.Dsir.gramBuckets(col("text"), 64, bigrams = false)
            .as("bs"))
        .withColumn("n", size(col("bs"))).where(col("n") > 0)
      val feats = (0 until 64).map(b =>
        size(filter(col("bs"), x => x === lit(b.toLong))).cast("double")
          / col("n"))
      graft.ops.Classify.logisticFit(withB, feats,
        col("doc_id") % 3 === 0, iterations = 5, lr = 1.0)
    }

    // r14: the continuous-score regime the cell-frame port exists for —
    // EVERY row a distinct value, so the cell frame IS the corpus; the
    // old Window.partitionBy(lit(1)) plan would sort it in ONE task.
    // 50M+ distinct values through ksTest / mannWhitney / aucDeLong /
    // cramerVonMises (all ride withPrefixSumsLong's range shuffle).
    time(s"r14 ksTest ${nDocs * 10} rows ALL-distinct (continuous)") {
      val two = spark.range(nDocs * 10).select(
        (col("id").cast("double") + (col("id") % 7).cast("double") / 10)
          .as("v"), (col("id") % 2 === 0).as("a"))
      force(graft.ops.Drift.ksTest(two, col("v"), col("a")))
    }
    time(s"r14 mannWhitney+cvm ${nDocs * 4} rows ALL-distinct") {
      val two = spark.range(nDocs * 4).select(
        (col("id").cast("double") * 1.000000001).as("v"),
        (col("id") % 2 === 0).as("a"))
      force(graft.ops.Drift.mannWhitney(two, col("v"), col("a")))
      force(graft.ops.Drift.cramerVonMises(two, col("v"), col("a")))
    }
    time(s"r14 aucDeLong ${nDocs * 4} rows ALL-distinct scores") {
      val sc = spark.range(nDocs * 4).select(
        (col("id").cast("double") * 1.000000001).as("s"),
        (col("id") % 3 === 0).as("y"))
      force(graft.ops.Eval.aucDeLong(sc, col("s"), col("y")))
    }
    time(s"r14 kaplanMeier global, ${nDocs * 4} rows, 1M distinct t") {
      val surv = spark.range(nDocs * 4).select(
        (col("id") % 1000000L).cast("double").as("t"),
        (col("id") % 4 =!= 0).as("e"))
      force(graft.ops.Survival.kaplanMeier(surv, Seq.empty, col("t"),
        col("e")))
    }

    // r14 session 2: the new rank-statistic consumers of the same
    // two-level machinery, at the all-distinct extreme (cell frame =
    // corpus), plus the bounded-grid/bounded-cell production arms.
    time(s"r14s2 brunnerMunzel ${nDocs * 4} rows ALL-distinct") {
      val two = spark.range(nDocs * 4).select(
        (col("id").cast("double") * 1.000000001).as("v"),
        (col("id") % 2 === 0).as("a"))
      force(graft.ops.Drift.brunnerMunzel(two, col("v"), col("a")))
    }
    time(s"r14s2 andersonDarlingK k=4, ${nDocs * 4} ALL-distinct") {
      val kf = spark.range(nDocs * 4).select(
        (col("id") % 4).cast("string").as("g"),
        (col("id").cast("double") * 1.000000001).as("v"))
      force(graft.ops.Drift.andersonDarlingK(kf, col("g"), col("v")))
    }
    time(s"r14s2 jonckheereTerpstra k=8, ${nDocs * 2} ALL-distinct") {
      val kf = spark.range(nDocs * 2).select(
        (col("id") % 8).cast("double").as("g"),
        (col("id").cast("double") * 1.000000001).as("v"))
      force(graft.ops.Drift.jonckheereTerpstra(kf, col("g"), col("v"),
        maxGroups = 8))
    }
    time(s"r14s2 kendallTauBucketed 1024-grid, ${nDocs * 2} rows") {
      val xy = spark.range(nDocs * 2).select(
        (col("id").cast("double") * 1.000000001).as("x"),
        ((col("id") % 1000003L).cast("double")
          + col("id").cast("double") / 1e9).as("y"))
      force(graft.ops.Profile.kendallTauBucketed(xy, col("x"),
        col("y")))
    }
    time(s"r14s2 hodgesLehmann 1k x 1k cells, ${nDocs * 2} rows") {
      val two = spark.range(nDocs * 2).select(
        (col("id") % 1000L).cast("double").as("v"),
        (col("id") % 2 === 0).as("a"))
      force(graft.ops.Robust.hodgesLehmann(two, col("v"), col("a")))
    }
    time(s"r14s2 msprt ${nDocs * 4} rows x 20 groups") {
      val mf = spark.range(nDocs * 4).select(
        concat(lit("g"), (col("id") % 20).cast("string")).as("g"),
        ((col("id") * 31) % 997).cast("double").as("v"))
      force(graft.ops.Drift.msprt(mf, Seq("g"), col("v"),
        mu0 = 498.0, tau = 5.0))
    }
    spark.stop()
  }
}
