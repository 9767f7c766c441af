package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning (Sennrich et al. 2016), the
  * tokenizer-training pass of an LLM data pipeline, as distributed
  * DataFrame algebra:
  *
  *  - state = the DISTINCT-word table (vocab-sized, ≪ corpus) with each
  *    word as a symbol array and its corpus frequency — the corpus itself
  *    is read once for word counts and never again;
  *  - each round: adjacent-pair counts (one explode + sum over the vocab
  *    table), a 1-row argmax to the driver (count desc, then (left, right)
  *    lexicographic — fully deterministic), and a codegen'd fold that
  *    greedily merges the chosen pair left-to-right in every word.
  *
  * The driver holds only the merge list; k rounds = k vocab-table passes.
  * The greedy "check-last" fold is exactly reference BPE's left-to-right
  * pass: a merged symbol never re-merges as LEFT in the same round
  * (merged ≠ left since right is non-empty).
  */
object Bpe {

  /** One learned merge: the pair and its weighted count when selected. */
  case class Merge(left: String, right: String, freq: Long)

  /** Corpus word frequencies: (word, freq) over whitespace tokens. */
  def wordCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Split a word into single-character symbols. */
  def charSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Split a word into single-BYTE symbols (UTF-8 bytes, each represented
    * as its Latin-1 character U+0000..U+00FF) — the GPT-2/Llama production
    * convention: a FIXED 256-symbol base alphabet means no `[UNK]` and no
    * unrepresentable input, at the cost of multi-byte characters starting
    * as 2–4 symbols. Pure built-in expressions (encode → 1-byte slice →
    * Latin-1 decode), so the split stays inside whole-stage codegen and,
    * like [[charSymbols]], only ever runs over word TYPES. */
  def byteSymbols(word: Column): Column = {
    import org.apache.spark.sql.{functions => F}
    transform(sequence(lit(1), octet_length(word)), i =>
      F.decode(F.encode(word, "UTF-8").substr(i, lit(1)), "ISO-8859-1"))
  }

  /** UTF-8 bytes of a string as array<long> values 0..255 — the
    * byte-fallback id arithmetic of [[Unigram.encodeByteFallback]] and
    * the single-byte id rule of [[encodeBytes]]. */
  private[ops] def utf8ByteValues(s: Column): Column =
    transform(byteSymbols(s), c => ascii(c).cast("long"))

  /** Greedy left-to-right application of ONE merge to a symbol array. */
  def mergeOnce(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === left && x === right,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Segment a word under an ordered merge list (apply each in turn). */
  def bpeSegment(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charSymbols(word)) { (c, m) =>
      mergeOnce(c, m.left, m.right)
    }

  /** Learn the first `k` merges. Stops early when no adjacent pair is left
    * (every word fused to one symbol). */
  def learnMerges(corpus: DataFrame, textCol: String, k: Int): Seq[Merge] =
    learnMergesSeeded(corpus, textCol, k, charSymbols)

  /** [[learnMerges]] over the byte alphabet ([[byteSymbols]]): merges fuse
    * byte sequences, so the learned tokenizer covers ANY input with no
    * unknown symbol — identical merges to the char mode on pure-ASCII
    * corpora (where byte ≡ char), diverging only where multi-byte
    * characters appear. */
  def learnMergesBytes(corpus: DataFrame, textCol: String,
      k: Int): Seq[Merge] =
    learnMergesSeeded(corpus, textCol, k, byteSymbols)

  /** Continue merge learning from an existing (e.g. [[TokenizerStore]]-
    * loaded) merge list: the corpus types are folded under `existing`
    * first (chunked like [[segmentWordsSeeded]] — an uncut fold of a
    * 32000-merge table would blow codegen), then the learn loop runs `k`
    * MORE rounds. Returns only the new merges; callers append. The
    * continuation identity — learn(a+b) ≡ learn(a) then continue(b) on
    * the same corpus — is gate-pinned (q221): extension is exact, not
    * approximate, because the sequential trainer's state is a pure
    * function of (corpus, merge list). */
  def learnMergesContinue(corpus: DataFrame, textCol: String,
      existing: Seq[Merge], k: Int): Seq[Merge] =
    learnMergesSeeded(corpus, textCol, k, charSymbols, existing)

  /** [[learnMergesContinue]] over the byte alphabet — the continuation
    * that pairs with [[learnMergesBytes]]. The two continue entry points
    * are deliberately distinct: replaying a byte-mode merge table over
    * [[charSymbols]] silently folds byte merges onto the char alphabet
    * (divergent state on any non-ASCII corpus, no error), so the seed is
    * part of the trainer-state contract — [[TokenizerStore.continueBpe]]
    * reads it from the stored layout's meta and dispatches. */
  def learnMergesBytesContinue(corpus: DataFrame, textCol: String,
      existing: Seq[Merge], k: Int): Seq[Merge] =
    learnMergesSeeded(corpus, textCol, k, byteSymbols, existing)

  private def learnMergesSeeded(corpus: DataFrame, textCol: String, k: Int,
      seed: Column => Column,
      existing: Seq[Merge] = Nil): Seq[Merge] = {
    require(k >= 1, "k must be >= 1")
    var state = wordCounts(corpus, textCol)
      .select(seed(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    existing.grouped(16).foreach { grp =>
      val prev = state
      state = state.select(grp.foldLeft(col("syms")) { (c, m) =>
        mergeOnce(c, m.left, m.right) }.as("syms"), col("freq"))
        .localCheckpoint()
      freeCheckpoint(prev)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.length < k && !exhausted) {
      val top = state
        // fused single-symbol words have no pairs (and sequence(0, -1)
        // would count DOWN) — drop them before the pair explode
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          j => struct(element_at(col("syms"), j + 1).as("l"),
            element_at(col("syms"), j + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += m
        // checkpoint per round: bounds the fold-chain lineage and reuses
        // the merged state for the next round's pair counts; the PREVIOUS
        // round's checkpoint is dead the moment the new one materializes —
        // unpersist it, or k=32000 rounds would pin thousands of vocab
        // tables in block storage
        val prev = state
        state = state.select(
          mergeOnce(col("syms"), m.left, m.right).as("syms"), col("freq"))
          .localCheckpoint()
        freeCheckpoint(prev)
      }
    }
    // the final state is consumed only through the returned merge list —
    // release its blocks too
    freeCheckpoint(state)
    merges.toSeq
  }

  /** Candidate window for [[learnMergesBatched]]'s per-round disjoint
    * selection — part of the algorithm's deterministic contract (the
    * oracle replays the same bound), not a tuning knob. */
  val BatchWindow = 64

  /** Batched-greedy merge learning — the production trainer shape: ONE
    * pair-count shuffle selects up to `batch` merges per round instead of
    * one, so a k=32000 vocabulary costs ~k/batch driver-coordinated
    * rounds rather than k (sequential rounds measured at ~0.3 s each —
    * 2.7 h of pure round latency at k=32000; batch=256 cuts that ~200×).
    *
    * Per round: rank pairs by (cnt desc, l, r), walk the top
    * [[BatchWindow]] in rank order and greedily keep a pair iff it shares
    * NO symbol with any already-kept pair's inputs OR fused output. That
    * disjointness makes the round's counts mutually faithful: applying a
    * kept merge can neither create nor destroy occurrences of another
    * kept pair (a merge only fuses its own two symbols; neighbors become
    * adjacent to the FUSED symbol, which no other kept pair references),
    * so all selections legitimately come from the same count table.
    *
    * `batch = 1` degenerates to exactly [[learnMerges]] (spec-pinned).
    * Results for `batch > 1` differ from sequential BPE in general — this
    * is the standard, documented speed/fidelity trade every parallel
    * trainer makes, replayable rule-for-rule (the q217 oracle). */
  def learnMergesBatched(corpus: DataFrame, textCol: String, k: Int,
      batch: Int = 64): Seq[Merge] = {
    require(k >= 1, "k must be >= 1")
    require(batch >= 1, "batch must be >= 1")
    var state = wordCounts(corpus, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.length < k && !exhausted) {
      val m = math.min(batch, k - merges.length)
      val window = state
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          j => struct(element_at(col("syms"), j + 1).as("l"),
            element_at(col("syms"), j + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(BatchWindow)
        .collect()
      if (window.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[Merge]
        window.iterator.takeWhile(_ => sel.length < m).foreach { r =>
          val (l, rr) = (r.getString(0), r.getString(1))
          if (!used(l) && !used(rr) && !used(l + rr)) {
            used ++= Seq(l, rr, l + rr)
            sel += Merge(l, rr, r.getLong(2))
          }
        }
        merges ++= sel
        // apply in selection order — disjointness makes each application
        // invisible to the others, so the order is only a convention;
        // chunked (segmentWords' 16) so a batch=256 round never nests
        // codegen 256 folds deep
        sel.grouped(16).foreach { grp =>
          val prev = state
          state = state.select(
            grp.foldLeft(col("syms")) { (c, mm) =>
              mergeOnce(c, mm.left, mm.right) }.as("syms"), col("freq"))
            .localCheckpoint()
          freeCheckpoint(prev)
        }
      }
    }
    freeCheckpoint(state)
    merges.toSeq
  }

  private def freeCheckpoint(df: DataFrame): Unit =
    CheckpointUtil.freeCheckpoint(df)

  // --- corpus-scale encode-to-ids ------------------------------------------
  //
  // The tokenizer-APPLICATION step every training pipeline runs after
  // merge learning: turn each document into its BPE piece-id sequence.
  // Scale shape mirrors [[Vocab.encode]] but with one extra trick: BPE
  // segmentation is a pure function of the WORD, so it runs once per word
  // TYPE (vocab-sized table, ≪ corpus) and the corpus only ever joins
  // (doc, pos, word) against the precomputed (word → piece ids) table —
  // the k-merge fold never touches a corpus-sized frame.

  /** Symbol vocabulary induced by a corpus + merge list, the id space of
    * [[encode]]: distinct single characters of the corpus's word types
    * (sorted) take ids 0..C−1, then each merge's fused symbol takes
    * C+i in merge order (first occurrence wins when two merges fuse to
    * the same string — ("ab","c") and ("a","bc") both yield "abc").
    * Output: (symbol, symbol_id). The window ranks the CHARACTER table —
    * alphabet-sized, single-partition by construction. */
  def symbolVocab(df: DataFrame, text: Column,
      merges: Seq[Merge]): DataFrame =
    symbolVocabFromWords(
      df.select(explode(split(text, "\\s+")).as("word"))
        .where(length(col("word")) > 0),
      merges)

  /** Code-point lexicographic string order ≡ UTF-8 byte order — the
    * collation DuckDB's ORDER BY uses, so driver-side symbol ranking
    * matches the oracle's for all of Unicode. */
  private[ops] val codePointOrdering: Ordering[String] =
    new Ordering[String] {
      def compare(a: String, b: String): Int = {
        var i = 0
        var j = 0
        while (i < a.length && j < b.length) {
          val ca = a.codePointAt(i)
          val cb = b.codePointAt(j)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca)
          j += Character.charCount(cb)
        }
        Integer.compare(a.length - i, b.length - j)
      }
    }

  /** [[symbolVocab]] over an already-extracted (word) frame — lets
    * [[encode]] reuse its word-type table instead of rescanning the
    * corpus. */
  def symbolVocabFromWords(words: DataFrame,
      merges: Seq[Merge]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    // the alphabet is bounded (≤ distinct code points of the corpus —
    // thousands at most), so rank it on the DRIVER: one distinct shuffle,
    // a tiny collect, and no partition-less Window in any plan.
    // Sort by CODE POINT, not Scala's default UTF-16 code-unit order: for
    // supplementary-plane symbols (emoji, rare CJK) surrogate pairs sort
    // below U+E000–U+FFFF under UTF-16, which would diverge from the
    // oracle's UTF-8-byte ORDER BY id space on non-BMP corpora
    val chars = words
      .select(explode(charSymbols(col("word"))).as("symbol"))
      .distinct()
      .as[String].collect().sorted(codePointOrdering)
    // fused symbols are always ≥ 2 chars, so they can never collide with
    // the single-char block; dedup among themselves preserving merge order
    val fused = merges.map(m => m.left + m.right).distinct
    (chars.toSeq ++ fused).zipWithIndex
      .map { case (sym, i) => (sym, i.toLong) }
      .toDF("symbol", "symbol_id")
  }

  /** Segment a (word)-column frame under an ordered merge list, applied in
    * expression-fold chunks of `chunk` merges with a localCheckpoint
    * between chunks: one [[mergeOnce]] fold per merge nests codegen k
    * deep, and an uncut thousand-merge chain would blow the janino method
    * limit — the checkpoint runs over the word-TYPE table, so its cost is
    * vocabulary-sized, not corpus-sized. Returns the input plus `syms`. */
  def segmentWords(words: DataFrame, merges: Seq[Merge],
      chunk: Int = 16): DataFrame =
    segmentWordsSeeded(words, merges, charSymbols, chunk)

  /** [[segmentWords]] with a caller-chosen base split ([[charSymbols]] or
    * [[byteSymbols]]) — the merge fold is alphabet-agnostic. */
  def segmentWordsSeeded(words: DataFrame, merges: Seq[Merge],
      seed: Column => Column, chunk: Int = 16): DataFrame = {
    require(chunk >= 1, "chunk must be >= 1")
    var cur = words.withColumn("syms", seed(col("word")))
    val checkpoints = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    merges.grouped(chunk).foreach { grp =>
      val folded = grp.foldLeft(col("syms")) { (c, m) =>
        mergeOnce(c, m.left, m.right)
      }
      cur = cur.withColumn("syms", folded).localCheckpoint()
      checkpoints += cur
    }
    // all but the LAST checkpoint are dead intermediates — free them
    checkpoints.dropRight(1).foreach(freeCheckpoint)
    cur
  }

  /** Tokenizer fertility report, grouped by `key` (usually language):
    * the table a team reads before committing to a merge budget —
    * fertility (pieces per word) and compression (chars per piece) per
    * group expose which languages a vocabulary under-serves (fertility
    * ≫ 1.3 on a language means its text costs that many more sequence
    * positions per word).
    *
    * Output: (key, n_words, n_pieces, n_chars, fertility,
    * chars_per_piece), fertility/chars rounded to 6.
    *
    * Scale shape: segmentation runs over the word-TYPE table
    * ([[segmentWords]]); the corpus token stream joins the tiny
    * (word → piece count, char count) table and aggregates straight to
    * the group key — no per-doc regroup, two corpus-sized passes total
    * (type distinct + token explode). */
  def fertilityByKey(df: DataFrame, text: Column, key: Column,
      merges: Seq[Merge]): DataFrame = {
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
    val wordPieces = segmentWords(types, merges)
      .select(col("word"), size(col("syms")).cast("long").as("__p"),
        length(col("word")).cast("long").as("__c"))
    fertilityFromWordPieces(df, text, key, wordPieces)
  }

  /** [[fertilityByKey]] for BYTE-mode merges ([[learnMergesBytes]] /
    * [[encodeBytes]]): segmentation runs over [[byteSymbols]], and the
    * `n_chars` / `chars_per_piece` columns count BYTES (equal on ASCII;
    * on multi-byte scripts bytes are what byte-mode sequence positions
    * actually cost, so this is the honest fertility for that tokenizer).
    * Same schema as the char variant so receipts stay comparable. */
  def fertilityByKeyBytes(df: DataFrame, text: Column, key: Column,
      merges: Seq[Merge]): DataFrame = {
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
    val wordPieces = segmentWordsSeeded(types, merges, byteSymbols)
      .select(col("word"), size(col("syms")).cast("long").as("__p"),
        octet_length(col("word")).cast("long").as("__c"))
    fertilityFromWordPieces(df, text, key, wordPieces)
  }

  /** Fertility aggregation shared by the tokenizer families ([[Bpe]],
    * [[Unigram]]): joins the corpus token stream against a tiny
    * (word → piece count, char count) table and aggregates straight to
    * the group key — no per-doc regroup. `wordPieces` must carry
    * (word, __p, __c). */
  private[ops] def fertilityFromWordPieces(df: DataFrame, text: Column,
      key: Column, wordPieces: DataFrame): DataFrame =
    df.select(key.as("key"), explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .join(wordPieces, Seq("word"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_words"),
        sum(col("__p")).as("n_pieces"),
        sum(col("__c")).as("n_chars"))
      .withColumn("fertility",
        round(col("n_pieces") / col("n_words"), 6))
      .withColumn("chars_per_piece",
        round(col("n_chars") / col("n_pieces"), 6))

  /** Encode documents to BPE piece-id sequences under a learned merge
    * list: the composition a 100 TB tokenization job actually runs.
    * Output: (idCol, ids array<long>), empty/null docs → empty arrays.
    *
    * Scale shape: segmentation + symbol-id mapping run over the word-TYPE
    * table ([[segmentWords]] — corpus-size independent); the corpus
    * explodes to (doc, pos, word) at the scan, joins the (word → piece
    * ids) table by word (plain hash join — the type table is NOT
    * broadcast: at web scale it can reach 10⁸ rows), and the only
    * corpus-sized shuffle regroups (doc, pos, ids) rows. Array assembly
    * is the same sorted streaming walk as [[Vocab.encode]] (one doc in
    * memory at a time — collect_list OOMs at billion-token scale),
    * flattening per-word piece arrays in (doc, pos) order. */
  def encode(df: DataFrame, idCol: String, text: Column,
      merges: Seq[Merge], unkId: Long = -1L): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    // word TYPES once (one corpus-sized distinct shuffle); chars and
    // segmentation both derive from this small table, so the corpus is
    // scanned exactly twice overall: here and in the token explode below
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
      .localCheckpoint(eager = false)
    val vocab = symbolVocabFromWords(types, merges)
    val wordIds = segmentWords(types, merges)
      .select(col("word"), posexplode(col("syms")).as(Seq("__sp", "__sym")))
      .join(broadcast(vocab.select(col("symbol").as("__sym"),
        col("symbol_id").as("__sid"))), Seq("__sym"), "left")
      // a symbol outside the vocab (encode under merges learned elsewhere)
      // maps to unkId rather than silently dropping the piece
      .select(col("word"), col("__sp"), coalesce(col("__sid"), lit(unkId))
        .as("__sid"))
      .groupBy("word")
      .agg(transform(array_sort(collect_list(struct(col("__sp"),
        col("__sid")))), x => x.getField("__sid")).as("__wids"))
    assembleIds(df, idCol, text, wordIds)
  }

  /** [[encode]] over the byte alphabet — the GPT-2/Llama id convention:
    * the base id space is the FIXED 256 bytes (id = byte value,
    * corpus-INDEPENDENT — two shards of a 100 TB job never disagree on
    * base ids and need no alphabet-ranking pass at all), each merge's
    * fused symbol takes 256+i in merge order (first occurrence wins).
    * Consequently there is NO unk id: every input byte is representable
    * by construction. Same scale shape as [[encode]] — segmentation and
    * id mapping over word TYPES, one corpus-sized regroup. */
  def encodeBytes(df: DataFrame, idCol: String, text: Column,
      merges: Seq[Merge]): DataFrame =
    encodeBytesTokens(df, idCol, split(text, "\\s+"), merges)

  /** Whitespace-preserving token array: every `\s*\S+` run keeps its
    * LEADING whitespace (the GPT-2 pre-tokenization convention) and a
    * trailing whitespace run survives as its own token — so
    * `concat(tokens) == text` for ANY input, which is what makes
    * [[encodeBytesLossless]]/[[decodeBytes]] a true inverse pair. */
  def losslessTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\s*\\S+|\\s+$"), lit(0))

  /** [[encodeBytes]] over [[losslessTokens]]: whitespace travels INSIDE
    * the id stream (space bytes are ordinary symbols of the fixed
    * 256-byte alphabet), so [[decodeBytes]] reconstructs the original
    * text byte-for-byte — the round-trip a byte-level production
    * tokenizer owes its detokenizer. Token types roughly double (a word
    * type may occur bare and space-prefixed); everything else matches
    * [[encodeBytes]]' scale shape. */
  def encodeBytesLossless(df: DataFrame, idCol: String, text: Column,
      merges: Seq[Merge]): DataFrame =
    encodeBytesTokens(df, idCol, losslessTokens(text), merges)

  private def encodeBytesTokens(df: DataFrame, idCol: String,
      tokens: Column, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val types = df
      .select(explode(tokens).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
      // LAZY checkpoint: no separate materialization job (the first
      // evaluation computes it in-line), but gates that evaluate the
      // encode output more than once (chunk family: packer + provenance
      // + receipts) reuse the cached types instead of redoing the
      // distinct per evaluation (r14: removing the checkpoint entirely
      // regressed q242/q240 by ~1-2 s; the eager form wasted a blocking
      // job on single-evaluation gates)
      .localCheckpoint(eager = false)
    // fused symbols are ≥ 2 byte-chars, so they can never collide with
    // the single-byte block; single-byte symbols map arithmetically
    // (Latin-1 char ↔ byte value), not through any table
    val fused = merges.map(m => m.left + m.right).distinct
      .zipWithIndex.map { case (s, i) => (s, 256L + i) }
      .toDF("__sym", "__sid")
    val wordIds = segmentWordsSeeded(types, merges, byteSymbols)
      .select(col("word"), posexplode(col("syms")).as(Seq("__sp", "__sym")))
      .join(broadcast(fused), Seq("__sym"), "left")
      .select(col("word"), col("__sp"),
        coalesce(col("__sid"), ascii(col("__sym")).cast("long"))
          .as("__sid"))
      .groupBy("word")
      .agg(transform(array_sort(collect_list(struct(col("__sp"),
        col("__sid")))), x => x.getField("__sid")).as("__wids"))
    assembleIdsTokens(df, idCol, tokens, wordIds)
  }

  /** Detokenization — the exact inverse of the byte-mode encodes: single
    * ids are their byte, fused ids their merge's byte string; the byte
    * stream decodes as UTF-8. For [[encodeBytesLossless]] output,
    * `decodeBytes(encode(text)) == text` byte-for-byte (whitespace rides
    * inside the ids); for [[encodeBytes]] output it returns the
    * space-collapsed word stream. Pure per-row reconstruction — the
    * fused table broadcasts, one doc's bytes in memory at a time. */
  def decodeBytes(encoded: DataFrame, idCol: String, idsCol: String,
      merges: Seq[Merge]): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val fusedBytes: Map[Long, Array[Byte]] =
      merges.map(m => m.left + m.right).distinct.zipWithIndex
        .map { case (s, i) => (256L + i) -> s.map(_.toByte).toArray }
        .toMap
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(fusedBytes)
    val outSchema = StructType(Seq(
      encoded.schema(idCol),
      StructField("text", StringType)))
    encoded.select(col(idCol), col(idsCol)).mapPartitions { it =>
      val tbl = bc.value
      it.map { r =>
        val ids = r.getSeq[Long](1)
        val buf = new java.io.ByteArrayOutputStream(ids.length * 2)
        ids.foreach { id =>
          if (id < 256L) buf.write(id.toInt)
          else buf.write(tbl(id))
        }
        Row(r.get(0),
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Corpus id-sequence assembly shared by the tokenizer families
    * ([[Bpe.encode]], [[Unigram.encode]]): explode the corpus to
    * (doc, pos, word) at the scan, hash-join the (word → piece ids)
    * type table (`wordIds` carrying (word, __wids) — NOT broadcast: at
    * web scale it can reach 10⁸ rows), regroup on the doc key, and
    * flatten per-word piece arrays in (doc, pos) order with the sorted
    * streaming walk (one doc in memory at a time — collect_list OOMs at
    * billion-token scale). */
  private[ops] def assembleIds(df: DataFrame, idCol: String, text: Column,
      wordIds: DataFrame): DataFrame =
    assembleIdsTokens(df, idCol, split(text, "\\s+"), wordIds)

  /** [[assembleIds]] over a caller-chosen token array — the lossless
    * encode path passes whitespace-preserving tokens instead of the
    * `\s+` split. */
  private[ops] def assembleIdsTokens(df: DataFrame, idCol: String,
      tokens: Column, wordIds: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val toks = df.select(col(idCol),
      posexplode_outer(tokens).as(Seq("__pos", "__tok")))
    val mapped = toks
      .join(wordIds.select(col("word").as("__tok"), col("__wids")),
        Seq("__tok"), "left")
      .select(col(idCol), col("__pos"),
        when(col("__tok").isNull || length(col("__tok")) === 0, lit(null))
          .otherwise(col("__wids")).as("__wids"))
    val outSchema = StructType(Seq(
      mapped.schema.fields(0),
      StructField("ids", ArrayType(LongType, containsNull = false))))
    mapped
      .repartition(col(idCol))
      .sortWithinPartitions(col(idCol), col("__pos"))
      .mapPartitions { it =>
        val in = it.buffered // see Vocab.encode on the naming trap here
        new Iterator[Row] {
          def hasNext: Boolean = in.hasNext
          def next(): Row = {
            val id = in.head.get(0)
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (in.hasNext && in.head.get(0) == id) {
              val r = in.next()
              if (!r.isNullAt(2)) r.getSeq[Long](2).foreach(ids += _)
            }
            Row(id, ids.toSeq)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
