package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** BPE merge learning (ops.Bpe): hand-worked merges, greedy fold edges,
  * segmentation under a learned merge list. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("learnMerges: hand-worked merge sequence") {
    // 'aaab' ×3, 'aab' ×1 → pairs: (a,a)=3·2+1=7, (a,b)=4
    val corpus = Seq("aaab aaab aaab aab").toDF("text")
    val m = Bpe.learnMerges(corpus, "text", 3)
    // round 1: (a,a)=7 → aaab=[aa,a,b], aab=[aa,b]
    assert(m(0) == Bpe.Merge("a", "a", 7))
    // round 2: pairs now (aa,a)=3, (a,b)=3, (aa,b)=1 → tie broken by
    // (l, r) lexicographic: "a" < "aa" so (a,b) wins
    assert(m(1) == Bpe.Merge("a", "b", 3))
    // round 3: aaab=[aa,ab], aab=[aa,b] → (aa,ab)=3, (aa,b)=1
    assert(m(2) == Bpe.Merge("aa", "ab", 3))
  }

  test("mergeOnce: greedy left-to-right, no re-merge of fresh symbols") {
    val got = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
        Seq("b", "a", "a"), Seq("a"), Seq.empty[String])
      .toDF("syms").select(Bpe.mergeOnce($"syms", "a", "a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.toList == List(List("aa", "a"), List("aa", "aa"),
      List("b", "aa"), List("a"), Nil))
  }

  test("bpeSegment applies merges in order") {
    val merges = Seq(Bpe.Merge("a", "a", 0L), Bpe.Merge("aa", "b", 0L))
    val got = Seq("aabab", "aaaab", "xy").toDF("w")
      .select(Bpe.bpeSegment($"w", merges)).collect()
      .map(_.getSeq[String](0).toList)
    assert(got.toList == List(
      List("aab", "a", "b"),      // [aa,b,a,b] → aa+b merges, lone a,b stay
      List("aa", "aab"),          // [aa,aa,b] → second aa takes the b
      List("x", "y")))            // untouched by either merge
  }

  test("learnMerges matches an in-memory reference on randomized corpora") {
    // independent reference: true left-to-right greedy merge (index walk,
    // not the check-last fold) + explicit (cnt desc, l, r) selection
    def reference(text: String, k: Int): Seq[Bpe.Merge] = {
      var vocab: Map[List[String], Long] = text.split("\\s+")
        .filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => w.map(_.toString).toList -> ws.length.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.zip(syms.drop(1)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + f } }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq
            .sortBy { case ((l, r), c) => (-c, l, r) }.head
          out += Bpe.Merge(l, r, c)
          vocab = vocab.map { case (syms, f) =>
            val b = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.toList -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val text = Seq.fill(40)(
        (0 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .mkString(" ")
      val want = reference(text, 5)
      val got = Bpe.learnMerges(Seq(text).toDF("text"), "text", 5)
      assert(got == want, s"trial $trial corpus=$text")
    }
  }

  test("learnMerges exhausts when every word is one symbol") {
    val m = Bpe.learnMerges(Seq("ab ab cd").toDF("text"), "text", 10)
    // only 2 possible merges exist: (a,b) then (c,d)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"), ("c", "d")))
  }

  test("symbolVocab: sorted chars then fused symbols, first-occurrence dedup") {
    val merges = Seq(Bpe.Merge("a", "b", 0), Bpe.Merge("ab", "c", 0),
      Bpe.Merge("a", "bc", 0)) // "abc" twice: ab+c wins (earlier merge)
    val got = Bpe.symbolVocab(Seq("cab abc").toDF("text"), $"text", merges)
      .orderBy("symbol_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    // chars {a,b,c} sorted → 0..2; then ab=3, abc=4 (dedup keeps rank order)
    assert(got == List(("a", 0L), ("b", 1L), ("c", 2L),
      ("ab", 3L), ("abc", 4L)))
  }

  test("encode: hand-worked piece-id sequences") {
    val docs = Seq((1L, "aab ab"), (2L, "b  c"), (3L, ""), (4L, "abc"))
      .toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("a", "b", 0))
    // chars {a,b,c} → a=0,b=1,c=2; ab=3
    // "aab"→[a,ab]=[0,3]; "ab"→[ab]=[3]; "b"→[1]; "c"→[2]; "abc"→[ab,c]=[3,2]
    val got = Bpe.encode(docs, "doc_id", $"text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toList
    assert(got == List((1L, List(0L, 3L, 3L)), (2L, List(1L, 2L)),
      (3L, Nil), (4L, List(3L, 2L))))
  }

  test("encode under foreign merges maps unseen symbols to unkId") {
    // merges learned elsewhere fuse "xy" — absent from this corpus's
    // symbol vocab ({a,b} chars + "xy" fused IS in the vocab; but a char
    // outside the corpus alphabet can only arise via segmentation of a
    // word whose chars weren't in the TYPE table — impossible by
    // construction. The reachable OOV case is a fused symbol colliding
    // out of vocab when callers pass a vocab-less pipeline; assert the
    // coalesce path by checking ids are never null and unkId only for
    // genuinely unmapped pieces (none here).
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("x", "y", 0))
    val got = Bpe.encode(docs, "doc_id", $"text", merges, unkId = -7L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toList
    // chars {a,b} → a=0,b=1; "xy"=2 unused; every piece resolves
    assert(got == List((1L, List(0L, 1L, 1L, 0L))))
  }

  test("fertilityByKey: hand-worked pieces/words/chars per group") {
    val docs = Seq(("en", "ab ab cd"), ("en", "ab"), ("de", "cd e"))
      .toDF("lang", "text")
    val merges = Seq(Bpe.Merge("a", "b", 0)) // "ab"→1 piece; "cd"→2; "e"→1
    val got = Bpe.fertilityByKey(docs, $"text", $"lang", merges)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toList
    // en: words {ab, ab, cd, ab} → 4 words, pieces 1+1+2+1=5, chars 8
    // de: words {cd, e} → 2 words, pieces 2+1=3, chars 3
    assert(got == List(
      ("de", 2L, 3L, 3L, 1.5, 1.0),
      ("en", 4L, 5L, 8L, 1.25, 1.6)))
  }

  test("segmentWords: chunked fold ≡ single fold, no leaked checkpoints") {
    // compare RDD-id SETS, not counts: the shared session's ContextCleaner
    // may reclaim DEAD checkpoints from earlier tests mid-run, which a
    // count-based assertion misreads as a (negative) leak
    def ids: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val words = Seq("aaab", "abab", "ba", "a").toDF("word")
    val merges = Seq(Bpe.Merge("a", "a", 0), Bpe.Merge("a", "b", 0),
      Bpe.Merge("aa", "ab", 0))
    val whole = words.select(Bpe.bpeSegment($"word", merges).as("syms"),
        $"word").orderBy("word").collect().map(_.getSeq[String](0).toList)
    for (chunk <- Seq(1, 2, 16)) {
      val before = ids
      val seg = Bpe.segmentWords(words, merges, chunk)
        .orderBy("word").collect()
      val got = seg.map(_.getSeq[String](
        seg.head.fieldIndex("syms")).toList)
      assert(got.toList == whole.toList, s"chunk=$chunk")
      // only the FINAL chunk's checkpoint may remain live until GC
      assert((ids -- before).size <= 1, s"chunk=$chunk leaked checkpoints")
    }
  }

  test("learnMerges leaves no checkpointed state behind (bounded storage)") {
    // each round localCheckpoints the next vocab table; the previous round's
    // blocks must be released or k rounds pin k tables — at k=32000 that is
    // thousands of dead materializations
    // set difference, not counts — ContextCleaner may reclaim other
    // tests' dead checkpoints concurrently (see segmentWords test)
    def ids: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = ids
    val corpus = Seq("aaab aaab aaab aab abab baba").toDF("text")
    val m = Bpe.learnMerges(corpus, "text", 6)
    assert(m.nonEmpty)
    assert((ids -- before).isEmpty,
      s"learnMerges leaked ${(ids -- before).size} persistent RDDs")
  }

  test("learnMergesContinue: learn(a) + continue(b) ≡ learn(a+b)") {
    val rnd = new scala.util.Random(9090)
    for (trial <- 1 to 3) {
      val text = Seq.fill(40)(
        (0 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .mkString(" ")
      val corpus = Seq(text).toDF("text")
      val whole = Bpe.learnMerges(corpus, "text", 6)
      val first = Bpe.learnMerges(corpus, "text", 3)
      val more = Bpe.learnMergesContinue(corpus, "text", first, 3)
      assert(first ++ more == whole, s"trial $trial corpus=$text")
    }
  }

  test("learnMergesBatched: batch=1 ≡ sequential learnMerges") {
    val rnd = new scala.util.Random(1717)
    for (trial <- 1 to 3) {
      val text = Seq.fill(40)(
        (0 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .mkString(" ")
      val corpus = Seq(text).toDF("text")
      assert(Bpe.learnMergesBatched(corpus, "text", 5, batch = 1) ==
        Bpe.learnMerges(corpus, "text", 5), s"trial $trial corpus=$text")
    }
  }

  test("learnMergesBatched: per-round disjoint selection, shared-symbol skip") {
    // word counts: cd ×3, aab ×2 → round-1 pairs ranked
    // (c,d)=3 > (a,a)=2 > (a,b)=2 (tie → lexicographic). batch=3:
    // keep (c,d); keep (a,a) (disjoint); SKIP (a,b) — shares 'a'.
    // round 2 recounts: aab=[aa,b] → (aa,b)=2 is the only pair left.
    val corpus = Seq("cd cd cd aab aab").toDF("text")
    val got = Bpe.learnMergesBatched(corpus, "text", 3, batch = 3)
    assert(got == Seq(Bpe.Merge("c", "d", 3), Bpe.Merge("a", "a", 2),
      Bpe.Merge("aa", "b", 2)))
  }

  test("learnMergesBatched: fused-output collision blocks same-round reuse") {
    // ranked round-1 pairs: (a,b)=4 first; candidate (ab,c) uses the
    // PRE-EXISTING fused symbol 'ab' (from words starting [ab,c…] — here
    // via a prior-round-free corpus where 'ab' never appears as a symbol,
    // so instead pin the rule directly: (a,b) kept → 'ab' enters the used
    // set → any candidate touching 'ab' is deferred to the next round.
    // corpus: 'ab'×4 as chars (a,b)=4; 'xy'×3 → (x,y)=3; 'za'×2 → (z,a)=2
    // shares 'a' → skipped; batch=3 keeps only (a,b),(x,y) this round.
    val corpus = Seq("ab ab ab ab xy xy xy za za").toDF("text")
    val got = Bpe.learnMergesBatched(corpus, "text", 3, batch = 3)
    assert(got.take(2) == Seq(Bpe.Merge("a", "b", 4), Bpe.Merge("x", "y", 3)))
    // (z,a) lands in round 2 with its recount (unchanged: 2)
    assert(got(2) == Bpe.Merge("z", "a", 2))
  }

  test("fertilityByKeyBytes: bytes are the cost unit; ASCII ≡ char mode") {
    val ascii = Seq(("en", "ab ab cd")).toDF("lang", "text")
    val merges = Seq(Bpe.Merge("a", "b", 0))
    def row(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(row(Bpe.fertilityByKeyBytes(ascii, $"text", $"lang", merges)) ==
      row(Bpe.fertilityByKey(ascii, $"text", $"lang", merges)))
    // 'éé' = 4 bytes → 4 byte symbols (no merges fire): fertility 4
    // pieces/word where CHAR mode would say 2
    val multi = Seq(("fr", "éé")).toDF("lang", "text")
    val got = Bpe.fertilityByKeyBytes(multi, $"text", $"lang",
        Seq.empty[Bpe.Merge])
      .collect().head
    assert(got.getLong(2) == 4L && got.getLong(3) == 4L,
      s"4 byte pieces / 4 bytes expected, got $got")
  }

  test("encodeBytesLossless ∘ decodeBytes == identity on adversarial text") {
    val texts = Seq(
      1L -> "plain words here",
      2L -> "  leading and trailing  ",
      3L -> "runs   of\t mixed \n whitespace",
      4L -> "héé multi✓byte 😀 text",
      5L -> "",
      6L -> "   ")
    val df = texts.toDF("doc_id", "text")
    val merges = Bpe.learnMergesBytes(df, "text", 3)
    val enc = Bpe.encodeBytesLossless(df, "doc_id", col("text"), merges)
    val got = Bpe.decodeBytes(enc, "doc_id", "ids", merges)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == t, s"doc $id: '${got(id)}' != '$t'")
    }
    // losslessTokens must concatenate back to the input exactly
    val toks = df.select(col("doc_id"),
        array_join(Bpe.losslessTokens(col("text")), "").as("back"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) => assert(toks(id) == t) }
  }

  test("byteSymbols: ASCII ≡ charSymbols; multi-byte chars split per byte") {
    val df = Seq("abc", "héllo", "a😀").toDF("word")
    val got = df.select(Bpe.byteSymbols($"word"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("a", "b", "c"))
    // é = 0xC3 0xA9 → Latin-1 chars U+00C3 U+00A9
    assert(got(1) == List("h", "Ã", "©", "l", "l", "o"))
    // 😀 = 0xF0 0x9F 0x98 0x80
    assert(got(2) == List("a", "\u00F0", "\u009F", "\u0098", "\u0080"))
  }

  test("learnMergesBytes ≡ learnMerges on a pure-ASCII corpus") {
    val corpus = Seq("aaab aaab aaab aab abab").toDF("text")
    assert(Bpe.learnMergesBytes(corpus, "text", 3) ==
      Bpe.learnMerges(corpus, "text", 3))
  }

  test("encodeBytes: fixed byte id space, no unk, lossless round-trip") {
    val texts = Map(1L -> "héé héé ha", 2L -> "ha ha héé")
    val corpus = texts.toSeq.toDF("doc_id", "text")
    val merges = Bpe.learnMergesBytes(corpus, "text", 2)
    assert(merges.size == 2)
    val fusedBytes: Map[Long, Array[Byte]] =
      merges.map(m => m.left + m.right).distinct.zipWithIndex
        .map { case (s, i) =>
          (256L + i) -> s.map(_.toByte).toArray }.toMap
    val enc = Bpe.encodeBytes(corpus, "doc_id", col("text"), merges)
      .collect()
    assert(enc.length == 2)
    enc.foreach { r =>
      val ids = r.getSeq[Long](1)
      assert(ids.forall(_ >= 0L), "byte mode can never emit an unk id")
      // decode ids back to bytes: singles are the byte value, fused are
      // their merge's byte string — must equal the words' exact UTF-8
      val back = ids.flatMap(id =>
        if (id < 256) Seq(id.toByte) else fusedBytes(id).toSeq)
      val want = texts(r.getLong(0)).split("\\s+").toSeq
        .flatMap(_.getBytes("UTF-8").toSeq)
      assert(back == want, "byte-mode encode must be lossless")
    }
  }
}
