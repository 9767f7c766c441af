package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.api.{functions => gf}

/** Exact-span dedup (shingle_hashes + Dedup.spanPairs) and TF-IDF term
  * ranking (ops.Text). */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("shingle_hashes: distinct, sorted, content-determined") {
    val rows = Seq("a b c d", "a b a b", "a b c d", "", "one")
      .toDF("t").select(gf.shingle_hashes(col("t"), 2).as("h")).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0).length == 3)                 // ab, bc, cd
    assert(rows(1).length == 2)                 // ab, ba (distinct)
    assert(rows(0) == rows(2))                  // pure function of text
    assert(rows(0) == rows(0).sorted)           // canonical ascending order
    assert(rows(3).isEmpty && rows(4).isEmpty)  // fewer tokens than window
  }

  private val spanDocs = Seq(
    (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"),          // base
    (2L, "x t5 t6 t7 t8 t9 t10 t11 t12"),                     // shares run t5..t12
    (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),                       // unrelated
    (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12")            // exact dup of 1
  ).toDF("doc_id", "text")

  test("spanPairs: shared 8-token runs found, counts exact") {
    val got = Dedup.spanPairs(spanDocs, "doc_id", "text",
        windowTokens = 8, minShared = 1, maxDocsPerSpan = 500)
      .orderBy("idA", "idB")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1 has 5 spans (12-8+1); doc2's single t5..t12 span matches one
    assert(got.toSeq == Seq((1L, 2L, 1L), (1L, 4L, 5L), (2L, 4L, 1L)))
  }

  test("spanPairs: hot-span guard drops boilerplate spans") {
    val boiler = (1L to 5L).map(i => (i, s"pre$i common1 common2 common3 " +
      "common4 common5 common6 common7 common8")).toDF("doc_id", "text")
    // the shared 8-token run appears in 5 docs > maxDocsPerSpan=4 → no pairs
    val guarded = Dedup.spanPairs(boiler, "doc_id", "text",
      windowTokens = 8, minShared = 1, maxDocsPerSpan = 4)
    assert(guarded.isEmpty)
    val unguarded = Dedup.spanPairs(boiler, "doc_id", "text",
      windowTokens = 8, minShared = 1, maxDocsPerSpan = 5)
    assert(unguarded.count() == 10) // C(5,2)
  }

  test("spanPairs: minShared filters weakly-overlapping pairs") {
    val got = Dedup.spanPairs(spanDocs, "doc_id", "text",
      windowTokens = 8, minShared = 2, maxDocsPerSpan = 500)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L)))
  }

  test("dedupParagraphs: first occurrence wins, docs reassemble in order") {
    val docs = Seq(
      (1L, "intro|common footer|body one"),
      (2L, "body two|common footer"),     // footer already seen in doc 1
      (3L, "common footer"),              // fully boilerplate → empty
      (4L, "intro")                       // 'intro' seen in doc 1
    ).toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(docs, "doc_id", "text", sep = "|")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "intro|common footer|body one", 3L, 0L),
      (2L, "body two", 1L, 1L),
      (3L, "", 0L, 1L),
      (4L, "", 0L, 1L)))
  }

  test("dedupParagraphs: within-doc repeats collapse to the first position") {
    val docs = Seq((9L, "a|b|a|a|c")).toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(docs, "doc_id", "text", sep = "|")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    assert(got == (("a|b|c", 3L, 2L)))
  }

  test("chunk: coverage, exact overlap, short tail, empty text") {
    val got = Seq("abcdefghij", "abc", "", "abcdefgh")
      .toDF("t").select(Text.chunk($"t", size = 4, overlap = 2))
      .collect().map(_.getSeq[String](0).toList)
    // step 2: windows at 1,3,5,7,9
    assert(got(0) == List("abcd", "cdef", "efgh", "ghij", "ij"))
    assert(got(1) == List("abc", "c"))
    assert(got(2) == Nil)
    assert(got(3) == List("abcd", "cdef", "efgh", "gh"))
    // invariants: every char covered, consecutive windows share the overlap
    got(0).sliding(2).foreach { case List(a, b) =>
      assert(a.takeRight(2) == b.take(2.min(b.length)) || b.length < 2) }
    assert(got(0).map(_.drop(2)).mkString.length +
      got(0).head.take(2).length == 10)
    // no overlap: plain partition
    val flat = Seq("abcdefgh").toDF("t")
      .select(Text.chunk($"t", 3)).head.getSeq[String](0)
    assert(flat.toList == List("abc", "def", "gh") && flat.mkString == "abcdefgh")
  }

  test("stripHtml: tags/script/style/comments out, entities unescaped") {
    val cases = Seq(
      // script and style bodies vanish entirely; tags become boundaries
      ("<html><body><h1>Title</h1><p>a b</p>" +
        "<script>var x = '<p>not text</p>';</script>" +
        "<style>p { color: red; }</style></body></html>", "Title a b"),
      // comments (multi-line) vanish; nested markup degrades to spaces
      ("pre<!-- a\nmulti-line <b>comment</b> -->post", "pre post"),
      // entity unescape order: &amp;lt; is the literal TEXT '&lt;'
      ("&amp;lt; &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
        "&lt; <b> \"q\" 's' end"),
      // tag-free text passes through with whitespace collapsed
      ("  plain   text\twith\n\nspace  ", "plain text with space"),
      // unterminated tag: everything to the next '>' is markup
      ("a <b unclosed attr=1 > b", "a b"))
    val got = cases.map(_._1).toDF("h")
      .select(Text.stripHtml($"h")).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("stripMarkdown: structure out, content kept, fixed pass order") {
    val cases = Seq(
      // headers/quotes/bullets/ordered prefixes drop, text stays
      ("# Title\n\n> quoted line\n\n- one\n- two\n2. three",
        "Title quoted line one two three"),
      // fenced code keeps its BODY, loses markers + info string
      ("before\n```scala\nval x = 1\n```\nafter", "before val x = 1 after"),
      // inline code, image alt, link anchor survive; urls vanish
      ("see `cmd -x` and [anchor](http://u/1) and ![alt text](i.png).",
        "see cmd -x and anchor and alt text."),
      // emphasis unwraps, bold before italic so ** doesn't half-match
      ("**bold** and *ital* and __bu__ and _iu_", "bold and ital and bu and iu"),
      // horizontal rule vanishes and is NOT a bullet
      ("a\n\n---\n\nb", "a b"),
      // documented heuristic trade-off: intra-word underscores unwrap
      ("snake_case_name", "snakecasename"))
    val got = cases.map(_._1).toDF("m")
      .select(Text.stripMarkdown($"m")).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"input <$in>: got <$g>")
    }
  }

  test("spanCorrupt: reconstruction inverts corruption; invariants hold") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")).limit(200)
    val out = Text.spanCorrupt(docs, "doc_id", col("text"),
        every = 20, spanLen = 3)
      .join(docs, Seq("doc_id"))
      .collect()
    assert(out.length == 200)
    var masked = 0L; var total = 0L
    out.foreach { r =>
      val (inp, tgt) = (r.getAs[String]("input_text"),
        r.getAs[String]("target_text"))
      val orig = r.getAs[String]("text").trim.split("\\s+")
        .filter(_.nonEmpty).mkString(" ")
      val nSpans = r.getAs[Long]("n_spans")
      masked += r.getAs[Long]("n_masked"); total += r.getAs[Long]("n_tokens")
      // parse target: sentinel k introduces span k's tokens
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      tgt.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Nil
        } else spans(cur) = spans(cur) :+ t
      }
      // sentinels are dense 0..n-1, in order of appearance
      assert(spans.keySet == (0 until nSpans.toInt).toSet, s"doc ${r.get(0)}")
      // substitution inverts the corruption exactly
      val rebuilt = inp.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }.mkString(" ")
      assert(rebuilt == orig, s"doc ${r.get(0)} reconstruction differs")
      // every span in target has 1..spanLen tokens... merged spans can
      // exceed spanLen; each has at least one token
      assert(spans.values.forall(_.nonEmpty))
    }
    // corruption rate ≈ spanLen/every = 15% (loose band on 200 docs)
    val rate = masked.toDouble / total
    assert(rate > 0.08 && rate < 0.25, s"rate $rate")
  }

  test("fimTransform: PSM parts reassemble the original; cuts in range") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")).limit(200)
    val out = Text.fimTransform(docs, "doc_id", col("text"), fimRate = 2)
      .join(docs, Seq("doc_id")).collect()
    val P = "<fim_prefix>"; val S = "<fim_suffix>"; val M = "<fim_middle>"
    var nFim = 0
    out.foreach { r =>
      val (orig, o) = (r.getAs[String]("text"), r.getAs[String]("out_text"))
      if (r.getAs[Int]("fim") == 1) {
        nFim += 1
        val c1 = r.getAs[Long]("c1"); val c2 = r.getAs[Long]("c2")
        assert(0 <= c1 && c1 <= c2 && c2 <= orig.length)
        assert(o.startsWith(P))
        val body = o.stripPrefix(P)
        val iS = body.indexOf(S); val iM = body.indexOf(M)
        assert(iS >= 0 && iM > iS)
        val pfx = body.substring(0, iS)
        val sfx = body.substring(iS + S.length, iM)
        val mid = body.substring(iM + M.length)
        assert(pfx + mid + sfx == orig, s"doc ${r.get(0)}")
        assert(pfx.length == c1 && mid.length == c2 - c1)
      } else assert(o == orig)
    }
    // fimRate=2 selects about half (loose band)
    assert(nFim > 60 && nFim < 140, s"nFim=$nFim")
  }

  test("readability: hand-counted syllables/sentences, formula values") {
    val df = Seq(
      (1L, "The cat sat."),                    // 3 words, 1 sentence, 3 syl
      (2L, "Hello beautiful world! Yes."),     // 4 w, 2 s, hello=2 beau-ti-ful? vowel runs: e-o=2, eau-i-u=3, o=1, e=1 → 7
      (3L, "zzz pfft"),                        // vowel-less words count 1 each
      (4L, ""))                                // empty → zero counts, NULL scores
      .toDF("id", "text")
    val got = Text.readability(df, col("text")).orderBy("id").collect()
    def row(i: Int) = got(i)
    assert(row(0).getAs[Long]("n_words") == 3 &&
      row(0).getAs[Long]("n_sentences") == 1 &&
      row(0).getAs[Long]("n_syllables") == 3)
    val ease0 = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(math.abs(row(0).getAs[Double]("flesch_ease") - ease0) < 1e-9)
    assert(row(1).getAs[Long]("n_sentences") == 2 &&
      row(1).getAs[Long]("n_syllables") == 7)
    assert(row(2).getAs[Long]("n_syllables") == 2) // max(1, runs) per word
    assert(row(3).getAs[Long]("n_words") == 0 &&
      row(3).isNullAt(row(3).fieldIndex("flesch_ease")))
  }

  test("spanCorrupt: empty/whitespace/null docs survive; one corpus shuffle") {
    val df = Seq((1L, ""), (2L, "  lead tok"),
        (3L, null.asInstanceOf[String]), (4L, "a b"))
      .toDF("id", "text")
    // every=1 masks EVERY token → one span per non-empty doc
    val out = Text.spanCorrupt(df, "id", col("text"), every = 1,
        spanLen = 2)
      .orderBy("id").collect()
    assert(out.length == 4)
    def r(i: Int) = out(i)
    Seq(0, 2).foreach { i => // empty + null docs: empty outputs, zero counts
      assert(r(i).getAs[String]("input_text") == "" &&
        r(i).getAs[String]("target_text") == "" &&
        r(i).getAs[Long]("n_tokens") == 0 &&
        r(i).getAs[Long]("n_spans") == 0)
    }
    // leading whitespace: the empty split token is NOT a window slot
    assert(r(1).getAs[String]("input_text") == "<extra_id_0>")
    assert(r(1).getAs[String]("target_text") == "<extra_id_0> lead tok")
    assert(r(1).getAs[Long]("n_tokens") == 2 &&
      r(1).getAs[Long]("n_masked") == 2 && r(1).getAs[Long]("n_spans") == 1)
    // plan: exactly ONE real shuffle (AQE prints the tree twice)
    val df2 = Text.spanCorrupt(spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")), "doc_id", col("text"))
    df2.collect()
    val nEx = "Exchange".r
      .findAllIn(df2.queryExecution.executedPlan.toString).length
    assert(nEx <= 2, s"expected one real shuffle, plan shows $nEx prints")
  }

  private val bm25Docs = Seq(
    (1L, "quick brown fox jumps"),
    (2L, "quick quick brown dog"),
    (3L, "lazy dog sleeps all day long here"),
    (4L, "fox fox fox den"),
    (5L, "unrelated words entirely different")
  ).toDF("doc_id", "text")

  test("bm25TopK: self-match first, term-bearing docs only, k respected") {
    val got = Text.bm25TopK(bm25Docs, bm25Docs.where($"doc_id" === 1),
        "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == 3)
    assert(got.forall(_._1 == 1L))
    assert(got.map(_._4).toSeq == Seq(1, 2, 3))
    // the query doc scores every one of its own terms → ranks itself first
    assert(got.head._2 == 1L)
    // scores are non-increasing down the ranking
    assert(got.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    // doc 5 shares no term with the query → never retrieved
    assert(!got.exists(_._2 == 5L))
  }

  test("bm25Search over round-tripped postings == one-shot bm25TopK") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_postings").toString
    Text.bm25Postings(bm25Docs, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val indexed = Text.bm25Search(spark.read.parquet(dir),
      bm25Docs.where($"doc_id" <= 2), "doc_id", "text", k = 4)
    val oneShot = Text.bm25TopK(bm25Docs, bm25Docs.where($"doc_id" <= 2),
      "doc_id", "text", k = 4)
    assert(indexed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(indexed).isEmpty)
    // materialized one-shot agrees too
    val mat = Text.bm25TopK(bm25Docs, bm25Docs.where($"doc_id" <= 2),
      "doc_id", "text", k = 4, materializePostings = true)
    assert(mat.exceptAll(oneShot).isEmpty && oneShot.exceptAll(mat).isEmpty)
  }

  test("bm25TopK: symmetric terms tie exactly, id breaks the tie") {
    // query 'jumps den': doc 1 holds 'jumps', doc 4 holds 'den' — tf=1,
    // df=1, dl=4 on both sides, so the scores are bit-identical and the
    // deterministic id tiebreak puts doc 1 first
    val q = Seq((99L, "jumps den")).toDF("doc_id", "text")
    val got = Text.bm25TopK(bm25Docs, q, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(_._1).toSet == Set(1L, 4L))
    assert(got.map(t => t._1 -> t._3).toMap == Map(1L -> 1, 4L -> 2))
    assert(got.map(_._2).distinct.length == 1) // exact score tie
  }

  test("bm25TopK: a rarer term outranks a common one at equal tf/dl") {
    // 'brown' appears in docs 1,2 (df=2); 'jumps' only in doc 1 (df=1).
    // Query 'brown' scores doc 2 lower than query 'jumps' scores doc 1
    // at the same tf=1, dl=4 — pure idf effect
    val qs = Seq((1L, "jumps"), (2L, "brown")).toDF("doc_id", "text")
    val got = Text.bm25TopK(bm25Docs, qs, "doc_id", "text", k = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 1L)) > got((2L, 2L)))
  }

  private val tfidfDocs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "banana dog")
  ).toDF("doc_id", "text")

  test("tfidf: term/doc frequencies and rational ranking") {
    val tf = Text.docTermFrequencies(tfidfDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((1L, "apple")) == 2 && tf((1L, "banana")) == 1 && tf.size == 6)

    val top = Text.tfidfTopTerms(tfidfDocs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // df: apple 1, banana 3, cherry 1, dog 1 → distinctive terms win
    assert(top == Map(1L -> "apple", 2L -> "cherry", 3L -> "dog"))
  }

  test("tfidf: ranks are dense 1..k and scores monotone within a doc") {
    val rows = Text.tfidfTopTerms(tfidfDocs, "doc_id", "text", 3)
      .where(col("doc_id") === 1L).orderBy("rank").collect()
    assert(rows.map(_.getInt(4)).toSeq == Seq(1, 2))  // only 2 terms in doc 1
    val scores = rows.map(r => r.getLong(2).toDouble / r.getLong(3))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("tfidfScore matches the ln formula") {
    val got = tfidfDocs.sparkSession.range(1).select(
      Text.tfidfScore(lit(3L), lit(2L), 10L).as("s")).head().getDouble(0)
    assert(math.abs(got - 3.0 * (math.log(11.0 / 3.0) + 1.0)) < 1e-12)
  }

  test("spanPairs plan: span exchange reused across the self-join") {
    val df = Dedup.spanPairs(spanDocs, "doc_id", "text", 8, 1, 500)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || !plan.contains("Exchange"), s"no exchange reuse in:\n$plan")
  }

  test("collocations: hand-computed PMI, minCount floor, deterministic rank") {
    import spark.implicits._
    // "x y" always adjacent (c_xy=3, c_x=3, c_y=3); "p q" once; fillers
    val df = Seq(
      (1L, "x y p q a"), (2L, "x y b c"), (3L, "x y d e")).toDF("id", "t")
    val got = Text.collocations(df, "id", "t", k = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // only (x,y) reaches minCount=2
    assert(got.length == 1)
    val (a, b, cab, pmi, rank) = got.head
    // N=13 tokens, M=10 bigrams; PMI = ln((3/10)/((3/13)*(3/13)))
    val want = math.log((3.0 / 10.0) / ((3.0 / 13.0) * (3.0 / 13.0)))
    assert(a == "x" && b == "y" && cab == 3L && rank == 1)
    assert(math.abs(pmi - want) < 1e-6)
  }

  test("collocations: \\s+ runs collapse — 'aa  bb' IS the adjacent pair (aa,bb)") {
    import spark.implicits._
    // corpus tokenization = \s+ with empties dropped (same as
    // docTermFrequencies / tokenHashes): double spaces, tabs and newlines
    // are separators, not token-killers; the final token's missing
    // successor must not throw under ANSI
    val df = Seq((1L, "aa  bb"), (2L, "aa\tbb"), (3L, "aa\nbb"))
      .toDF("id", "t")
    val got = Text.collocations(df, "id", "t", k = 5, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("aa", "bb", 3L)))
    // single-space text is unaffected by the tokenization rule
    val plain = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "aa bb")).toDF("id", "t")
    val gotPlain = Text.collocations(plain, "id", "t", k = 5, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(gotPlain.toSeq == got.toSeq)
  }

  test("zipfFit: a planted power law fits slope ≈ 1 with high r2") {
    import spark.implicits._
    // type t_r appears ⌈1000/r⌉ times, r = 1..50 — textbook Zipf
    val words = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"t$r"))
    val docs = words.grouped(40).map(_.mkString(" ")).toSeq.toDF("text")
    val row = Text.zipfFit(docs, "text").head()
    val slope = row.getAs[Double]("slope")
    val r2 = row.getAs[Double]("r2")
    assert(math.abs(slope - 1.0) < 0.05, s"slope $slope")
    assert(r2 > 0.99, s"r2 $r2")
    assert(row.getAs[Long]("n_tokens") == words.size)
    assert(row.getAs[Long]("n_types") == 50)
    assert(row.getAs[Long]("max_count") == 1000)
  }

  test("zipfFit: degenerate cases — uniform counts and empty corpus") {
    import spark.implicits._
    // all types equally frequent → one distinct count → no fit (NaN)
    val uniform = Seq("a b c d", "a b c d").toDF("text")
    val u = Text.zipfFit(uniform, "text").head()
    assert(u.getAs[Long]("n_types") == 4)
    assert(u.getAs[Double]("slope").isNaN && u.getAs[Double]("r2").isNaN)
    val e = Text.zipfFit(uniform.where(lit(false)), "text").head()
    assert(e.getAs[Long]("n_tokens") == 0)
    assert(e.getAs[Double]("slope").isNaN)
  }

  test("zipfFit is deterministic across partitionings") {
    import spark.implicits._
    val docs = (0 until 500).map(i =>
      (0 to i % 17).map(j => s"w${(i * j) % 97}").mkString(" "))
      .toDF("text")
    def bits(p: Int): (Long, Long) = {
      val r = Text.zipfFit(docs.repartition(p), "text").head()
      (java.lang.Double.doubleToRawLongBits(r.getAs[Double]("slope")),
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("r2")))
    }
    assert(bits(1) == bits(13))
  }
  test("heapsFit: hand-worked growth curve") {
    import spark.implicits._
    // doc 1: "a b" -> N=2, V=2; doc 2: "a c c" -> N=5, V=3;
    // doc 3: "d" -> N=6, V=4
    val df = Seq((1L, "a b"), (2L, "a c c"), (3L, "d"))
      .toDF("doc_id", "text")
    val r = Text.heapsFit(df, "doc_id", "text").head()
    assert(r.getLong(r.fieldIndex("n_docs")) == 3L)
    assert(r.getLong(r.fieldIndex("n_tokens")) == 6L)
    assert(r.getLong(r.fieldIndex("n_types")) == 4L)
    // OLS over (ln 2, ln 2), (ln 5, ln 3), (ln 6, ln 4)
    val pts = Seq((2.0, 2.0), (5.0, 3.0), (6.0, 4.0))
      .map { case (a, b) => (math.log(a), math.log(b)) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(r.fieldIndex("beta")) - beta) < 1e-12)
  }

  test("heapsFit: pure-repeat corpus has beta 0; empty/NULL docs " +
      "contribute no point; partition-invariant") {
    import spark.implicits._
    val rep = Seq((1L, "x"), (2L, "x x"), (3L, "x"))
      .toDF("doc_id", "text")
    val r0 = Text.heapsFit(rep, "doc_id", "text").head()
    assert(r0.getDouble(r0.fieldIndex("beta")) == 0.0) // V constant at 1
    val withEmpty = Seq((1L, "a b"), (2L, "   "), (3L, null),
      (4L, "a c")).toDF("doc_id", "text")
    val r1 = Text.heapsFit(withEmpty, "doc_id", "text").head()
    assert(r1.getLong(r1.fieldIndex("n_docs")) == 2L)
    val big = (1L to 60L).map(i => (i, s"w${i % 7} w${i % 13} common"))
      .toDF("doc_id", "text")
    val a = Text.heapsFit(big.repartition(1), "doc_id", "text").head()
    val b = Text.heapsFit(big.repartition(7), "doc_id", "text").head()
    assert(a.getDouble(a.fieldIndex("beta")) ==
      b.getDouble(b.fieldIndex("beta")))
  }
}
