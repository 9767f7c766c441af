package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.UnigramLm

/** Unigram-LM tokenizer (ops.Unigram / core.UnigramLm): hand-worked
  * Viterbi DP + tie-breaks, hard-EM learn dynamics, encode round-trip. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def tbl(entries: (String, Long)*)
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    entries.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  test("segment: picks the max-score path") {
    // ab as one piece (-10) beats a|b (-3 + -8 = -11)
    val t = tbl("a" -> -3L, "b" -> -8L, "ab" -> -10L)
    assert(UnigramLm.segment("ab", t, 4).toList == List("ab"))
    // but a|b (-3 + -4 = -7) beats ab (-10)
    val t2 = tbl("a" -> -3L, "b" -> -4L, "ab" -> -10L)
    assert(UnigramLm.segment("ab", t2, 4).toList == List("a", "b"))
  }

  test("segment: equal score prefers fewer pieces, then smaller start") {
    // ab=-7 ties a|b=-3-4=-7 → fewer pieces wins
    val t = tbl("a" -> -3L, "b" -> -4L, "ab" -> -7L)
    assert(UnigramLm.segment("ab", t, 4).toList == List("ab"))
    // 'aaa': a|aa = -5-6=-11, aa|a = -6-5=-11, a|a|a=-15 → both 2-piece
    // paths tie on (score, np); smaller start-of-last-piece j wins → a|aa
    val t3 = tbl("a" -> -5L, "aa" -> -6L)
    assert(UnigramLm.segment("aaa", t3, 4).toList == List("a", "aa"))
  }

  test("segment: unknown single chars fall back, never fail") {
    val t = tbl("a" -> -3L)
    assert(UnigramLm.segment("axa", t, 4).toList == List("a", "x", "a"))
    // a|x: fallback x = UnkScore; ax is NOT synthesized as a piece
    assert(UnigramLm.segment("ax", t, 4).toList == List("a", "x"))
    assert(UnigramLm.segment("", t, 4).isEmpty)
  }

  test("segment: maxPieceLen bounds candidate pieces") {
    val t = tbl("a" -> -9L, "aaaa" -> -1L)
    // with K=2 the -1 piece is out of reach
    assert(UnigramLm.segment("aaaa", t, 2).toList ==
      List("a", "a", "a", "a"))
    assert(UnigramLm.segment("aaaa", t, 4).toList == List("aaaa"))
  }

  test("segment: code-point positions (non-BMP safe)") {
    // 😀 is a surrogate pair in UTF-16; piece boundaries must not split it
    val t = tbl("😀" -> -2L, "a" -> -3L, "a😀" -> -4L)
    assert(UnigramLm.segment("a😀a", t, 4).toList == List("a😀", "a"))
  }

  test("scaledLogProb: half-away-from-zero at 1e-6, DuckDB round parity") {
    // ln(1/2)·1e6 = -693147.18... → -693147
    assert(UnigramLm.scaledLogProb(1, 2) == -693147L)
    // ln(1/e^2)≈-2e6 exactly-ish: ln(cnt/total) negative rounds AWAY
    assert(UnigramLm.scaledLogProb(1, 1) == 0L)
  }

  test("scaledLogProb ≡ DuckDB ln over the boundary-adversarial fixture") {
    // 6000 (cnt,total,score) rows computed ONCE by DuckDB's
    // round(ln(cnt::DOUBLE/total)*1e6)::BIGINT (dev/gen_unigram_score_
    // fixture.py), 4000 of them chosen as the candidates CLOSEST to a .5
    // rounding boundary out of 200k — the exact spots where a 1-ulp JVM
    // libm drift vs DuckDB would flip an integer piece score and desync
    // the whole q199–q201 Viterbi replay. Any platform drift fails here,
    // not as an unreproducible red gate.
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/unigram_scores.tsv"), "UTF-8")
    try {
      val rows = src.getLines().drop(1).map { l =>
        val Array(c, t, s) = l.split('\t'); (c.toLong, t.toLong, s.toLong)
      }.toList
      assert(rows.size == 6000)
      val bad = rows.filter { case (c, t, s) =>
        UnigramLm.scaledLogProb(c, t) != s }
      assert(bad.isEmpty,
        s"JVM-vs-DuckDB score drift on ${bad.size} rows, e.g. ${bad.take(3)}")
    } finally src.close()
  }

  test("learn: chars always kept, vocab budget respected, deterministic") {
    val docs = Seq.fill(4)("the cat then that hat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m1 = Unigram.learn(docs, col("text"), vocabSize = 12,
      maxPieceLen = 3, minCount = 2, seedCap = 16, emIters = 2)
    val m2 = Unigram.learn(docs, col("text"), vocabSize = 12,
      maxPieceLen = 3, minCount = 2, seedCap = 16, emIters = 2)
    assert(m1.entries == m2.entries, "learn must be deterministic")
    val chars = m1.entries.filter(_.piece.length == 1).map(_.piece)
    assert(chars.toSet == Set("t", "h", "e", "c", "a", "n"))
    assert(chars == chars.sorted, "char ids in code-point order")
    assert(m1.entries.size <= 12)
    // ids are 0..n-1 in order
    assert(m1.entries.map(_.id) == m1.entries.indices.map(_.toLong))
    // multi-char pieces ranked by (count desc, piece asc) after chars
    val multi = m1.entries.filter(_.piece.length > 1)
    assert(multi == multi.sortBy(e => (-e.count, e.piece)))
  }

  test("encode: ids concatenate per-word segmentations in order") {
    // 'ab' survives EM: p(ab)=3/12 > p(a)·p(b)=(3/12)(6/12) — a piece
    // lives iff it beats its own char decomposition under the unigram LM
    val docs = Seq((1L, "ab b"), (2L, "b ab ab"), (3L, ""))
      .toDF("doc_id", "text")
    val m = Unigram.learn(docs, col("text"), vocabSize = 10,
      maxPieceLen = 2, minCount = 1, seedCap = 8, emIters = 1)
    val byPiece = m.entries.map(e => e.piece -> e.id).toMap
    val got = Unigram.encode(docs, "doc_id", col("text"), m)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val ab = byPiece("ab")
    val b = byPiece("b")
    assert(got(1L) == List(ab, b))
    assert(got(2L) == List(b, ab, ab))
    assert(got(3L) == Nil)
  }

  test("encode: unseen chars map to unkId") {
    val learnDocs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val m = Unigram.learn(learnDocs, col("text"), vocabSize = 8,
      maxPieceLen = 2, minCount = 1, seedCap = 8, emIters = 1)
    val got = Unigram.encode(Seq((9L, "axz")).toDF("doc_id", "text"),
        "doc_id", col("text"), m, unkId = -1L)
      .collect().map(r => r.getSeq[Long](1).toList)
    assert(got.head.count(_ == -1L) == 2, s"x,z must be unk: ${got.head}")
  }

  test("encodeByteFallback: unknown chars → V+byte ids, known keep ids") {
    // model learned WITHOUT 'z' or 'é'; encoding text containing them must
    // decompose each unknown char into UTF-8 bytes at reserved ids V+b
    val train = Seq((1L, "aba aba ab")).toDF("doc_id", "text")
    val m = Unigram.learn(train, col("text"), vocabSize = 8,
      maxPieceLen = 3, minCount = 1, seedCap = 8, emIters = 1)
    val v = m.entries.size.toLong
    val docs = Seq((1L, "aba zé")).toDF("doc_id", "text")
    val got = Unigram.encodeByteFallback(docs, "doc_id", col("text"), m)
      .collect().head.getSeq[Long](1)
    val plain = Unigram.encode(Seq((1L, "aba")).toDF("doc_id", "text"),
      "doc_id", col("text"), m).collect().head.getSeq[Long](1)
    // 'z' = byte 122; 'é' = bytes 0xC3 0xA9 = 195, 169
    assert(got == plain ++ Seq(v + 122L, v + 195L, v + 169L))
    assert(got.forall(_ >= 0L), "byte fallback can never emit unk")
  }

  test("coverageByKey: fallback bytes per group, known pieces one id each") {
    val train = Seq((1L, "aba aba ab")).toDF("doc_id", "text")
    val m = Unigram.learn(train, col("text"), vocabSize = 8,
      maxPieceLen = 3, minCount = 1, seedCap = 8, emIters = 1)
    // how many ids the model emits for each fully-known word
    def nIds(w: String): Long =
      Unigram.encode(Seq((1L, w)).toDF("doc_id", "text"),
        "doc_id", col("text"), m).collect().head.getSeq[Long](1).size.toLong
    val docs = Seq(("g1", "aba zé"), ("g2", "ab ab")).toDF("grp", "text")
    val got = Unigram.coverageByKey(docs, col("text"), col("grp"), m)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    // g1: 'zé' = 2 unknown single chars → 'z' 1 byte + 'é' 2 bytes = 3
    // fallback ids; g2: fully known, zero fallback
    assert(got == List(
      ("g1", 2L, nIds("aba") + 3L, 2L, 3L),
      ("g2", 2L, 2L * nIds("ab"), 0L, 0L)))
  }

  test("encodeLossless ∘ decode == identity on adversarial text") {
    val texts = Seq(
      1L -> "plain words here",
      2L -> "  leading and trailing  ",
      3L -> "runs   of\t mixed \n whitespace",
      4L -> "héé multi✓byte 😀 text",
      5L -> "",
      6L -> "   ")
    val df = texts.toDF("doc_id", "text")
    val m = Unigram.learnLossless(df, col("text"), vocabSize = 24,
      maxPieceLen = 3, minCount = 1, seedCap = 16, emIters = 1)
    val enc = Unigram.encodeLossless(df, "doc_id", col("text"), m)
    val got = Unigram.decode(enc, "doc_id", "ids", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == t, s"doc $id: '${got(id)}' != '$t'")
    }
  }

  test("fertility: weighted by corpus tokens, grouped") {
    val docs = Seq((1L, "ab ab b", "x"), (2L, "ab", "y"))
      .toDF("doc_id", "text", "g")
    val m = Unigram.learn(docs, col("text"), vocabSize = 10,
      maxPieceLen = 2, minCount = 1, seedCap = 8, emIters = 1)
    val rows = Unigram.fertilityByKey(docs, col("text"), col("g"), m)
      .orderBy("key").collect()
    assert(rows.length == 2)
    val x = rows(0)
    assert(x.getAs[Long]("n_words") == 3)
    // 'ab' one piece, 'b' one piece → 3 pieces over 3 words
    assert(x.getAs[Long]("n_pieces") == 3)
    assert(x.getAs[Double]("fertility") == 1.0)
  }

  test("learnContinue: same corpus, roomy budget ≡ more EM iterations") {
    val docs = Seq((1L, "abab abab ab ba"), (2L, "abab ba ba ab"))
      .toDF("doc_id", "text")
    // budget 32 >> survivors: the store's prune keeps everything, so the
    // continuation identity is exact — learn(n+k) == continue(learn(n), k)
    val oneShot = Unigram.learn(docs, col("text"), vocabSize = 32,
      maxPieceLen = 3, minCount = 1, seedCap = 16, emIters = 3)
    val first = Unigram.learn(docs, col("text"), vocabSize = 32,
      maxPieceLen = 3, minCount = 1, seedCap = 16, emIters = 2)
    val cont = Unigram.learnContinue(docs, col("text"), first,
      vocabSize = 32, emIters = 1)
    assert(cont.entries == oneShot.entries)
    assert(cont.maxPieceLen == oneShot.maxPieceLen)
  }

  test("learnContinue: new shard keeps the piece inventory frozen") {
    val shardA = Seq((1L, "abab abab caca")).toDF("doc_id", "text")
    val shardB = Seq((2L, "abab dd dd dd abab abab")).toDF("doc_id", "text")
    val m = Unigram.learn(shardA, col("text"), vocabSize = 16,
      maxPieceLen = 2, minCount = 1, seedCap = 8, emIters = 1)
    val m2 = Unigram.learnContinue(shardB, col("text"), m,
      vocabSize = 16, emIters = 1)
    // no re-seeding: shard B's novel strings ('dd') may NOT enter the
    // vocabulary — that would fork the id space between shards
    assert(!m2.entries.exists(_.piece == "dd"))
    // ...but shard B's counts re-estimate the surviving pieces: 'ab'
    // appears more often, 'ca' not at all (multi pieces drop, chars
    // floor at 1)
    val abNew = m2.entries.find(_.piece == "ab")
    val abOld = m.entries.find(_.piece == "ab")
    assert(abNew.isDefined && abOld.isDefined &&
      abNew.get.count > abOld.get.count)
    assert(!m2.entries.exists(_.piece == "ca"))
    assert(m2.entries.filter(_.piece.length == 1).map(_.piece) ==
      m.entries.filter(_.piece.length == 1).map(_.piece),
      "alphabet (and its id block) must be shard-invariant")
  }

  test("prune keeps all chars, top multis by count, original ids/scores") {
    val docs = Seq((1L, "abab abab cdcd cd ab"), (2L, "abab cdcd ab cd"))
      .toDF("doc_id", "text")
    val m = Unigram.learn(docs, col("text"), vocabSize = 12,
      maxPieceLen = 4, minCount = 1, seedCap = 16, emIters = 2)
    val p = Unigram.prune(m, keepMulti = 1)
    // all single-char pieces survive
    val chars = m.entries.filter(_.piece.length == 1).map(_.piece).toSet
    assert(p.entries.filter(_.piece.length == 1).map(_.piece).toSet
      == chars)
    // exactly one multi survives: the highest-count one
    val multis = p.entries.filter(_.piece.length >= 2)
    assert(multis.length == 1)
    val expected = m.entries.filter(_.piece.length >= 2)
      .maxBy(e => (e.count, e.piece.reverse))
    assert(multis.head.piece ==
      m.entries.filter(_.piece.length >= 2)
        .sortBy(e => (-e.count, e.piece)).head.piece)
    // survivors keep id AND score bit-for-bit
    p.entries.foreach { e =>
      val orig = m.entries.find(_.piece == e.piece).get
      assert(e.id == orig.id && e.score == orig.score &&
        e.count == orig.count)
    }
    // encode under the pruned model still total over the corpus alphabet
    val enc = Unigram.encode(docs, "doc_id", col("text"), p)
    assert(enc.count() == 2)
    // store round-trip preserves the pruned model exactly
    val dir = java.nio.file.Files.createTempDirectory("up").toString
    TokenizerStore.saveUnigram(spark, p, s"$dir/u")
    val back = TokenizerStore.loadUnigram(spark, s"$dir/u")
    assert(back == p)
  }

  test("expression stays codegen-compatible (no CodegenFallback)") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Unigram.learn(docs, col("text"), vocabSize = 8,
      maxPieceLen = 2, minCount = 1, seedCap = 8, emIters = 1)
    val df = Seq("ab", "ba").toDF("word")
      .select(m.segmentCol(col("word")).as("seg"))
    df.collect() // force execution through codegen
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
