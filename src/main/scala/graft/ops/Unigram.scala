package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpr}

import graft.core.UnigramLm
import graft.expr.UnigramSegmentExpr

/** Unigram-LM (SentencePiece-style) tokenizer — the OTHER dominant
  * subword family next to BPE ([[Bpe]]): a piece vocabulary scored by a
  * unigram language model, fit with fixed-iteration hard EM (Viterbi
  * counts) and applied by Viterbi segmentation (Kudo 2018).
  *
  * Deterministic by construction (see [[UnigramLm]]'s contract): integer-
  * scaled log scores, canonical DP tie-breaks, fixed iteration count, and
  * every ranking ordered by (count desc, piece code-point asc) — so the
  * whole learn → prune → encode pipeline is replayable in DuckDB SQL as
  * unrolled MATERIALIZED CTEs (the q199–q201 oracles).
  *
  * Scale shape (the 100 TB contract, mirroring [[Bpe]]):
  *  - the corpus is scanned twice total (word-type distinct + the token
  *    explode in encode/fertility); EVERYTHING else — seeding, EM,
  *    pruning, segmentation — runs over the word-TYPE table (millions of
  *    rows at web scale, not billions);
  *  - per EM iteration: one scan-side Viterbi pass over types + one
  *    vocabulary-sized count shuffle; the only driver state is the
  *    codebook itself (seedCap + alphabet entries, like [[Bpe]]'s merge
  *    table), refreshed emIters times;
  *  - seed candidates are capped at `seedCap` via TakeOrdered (no global
  *    window, no full collect of the substring table).
  */
object Unigram {
  /** One vocabulary entry: final EM count, integer-scaled log score
    * (see [[UnigramLm.scaledLogProb]]), and the piece id (chars first in
    * code-point order, then multi-char pieces by count desc, piece asc). */
  case class PieceEntry(piece: String, count: Long, score: Long, id: Long)

  /** A learned unigram tokenizer: `entries` in id order. */
  case class Model(entries: IndexedSeq[PieceEntry], maxPieceLen: Int) {
    def segmentCol(word: Column): Column =
      toColumn(UnigramSegmentExpr(entries.map(_.piece).toArray,
        entries.map(_.score).toArray, maxPieceLen, toExpr(word)))
  }

  private def wordTypes(df: DataFrame, text: Column): DataFrame =
    tokenTypes(df, split(text, "\\s+"))

  private def tokenTypes(df: DataFrame, tokens: Column): DataFrame =
    df.select(explode(tokens).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** All substrings of length 1..maxLen of `word`, one array element per
    * (start, len) occurrence — the unigram seed candidate stream. */
  private def substrPieces(word: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), i =>
      filter(transform(sequence(lit(1), lit(maxLen)),
        l => when(i + l - 1 <= length(word), word.substr(i, l))),
        p => p.isNotNull)))

  /** Fit a unigram-LM vocabulary. `vocabSize` is the TOTAL size including
    * the full single-char alphabet (always retained for coverage, with a
    * count floor of 1 — SentencePiece's required-character rule). */
  def learn(df: DataFrame, text: Column, vocabSize: Int,
      maxPieceLen: Int = 4, minCount: Int = 2, seedCap: Int = 64,
      emIters: Int = 2): Model =
    learnTokens(df, split(text, "\\s+"), vocabSize, maxPieceLen, minCount,
      seedCap, emIters)

  /** [[learn]] over [[Bpe.losslessTokens]] — whitespace enters the
    * alphabet (each token keeps its leading spaces), so pieces can span
    * the space/word boundary and [[decode]] of an [[encodeLossless]]
    * stream reconstructs the original text exactly (the SentencePiece
    * whitespace-meta-symbol idea, but with REAL space bytes, so runs of
    * whitespace survive too). */
  def learnLossless(df: DataFrame, text: Column, vocabSize: Int,
      maxPieceLen: Int = 4, minCount: Int = 2, seedCap: Int = 64,
      emIters: Int = 2): Model =
    learnTokens(df, Bpe.losslessTokens(text), vocabSize, maxPieceLen,
      minCount, seedCap, emIters)

  private def learnTokens(df: DataFrame, tokens: Column, vocabSize: Int,
      maxPieceLen: Int, minCount: Int, seedCap: Int,
      emIters: Int): Model = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emIters >= 0)
    val types = tokenTypes(df, tokens).localCheckpoint()
    // seed candidate counts: one explode over word TYPES (vocab-sized),
    // weighted by corpus frequency
    val subCnt = types
      .select(explode(substrPieces(col("word"), maxPieceLen)).as("piece"),
        col("freq"))
      .groupBy("piece")
      .agg(sum(col("freq")).as("cnt"))
      .localCheckpoint()
    // the alphabet is bounded — collect fully; multi-char candidates are
    // capped via TakeOrdered (distributed top-k, no global window)
    val chars = subCnt.where(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi0 = subCnt
      .where(length(col("piece")) >= 2 && col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(seedCap)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    CheckpointUtil.freeCheckpoint(subCnt)

    val charCnts: Seq[(String, Long)] =
      chars.toSeq.sortBy(_._1)(Bpe.codePointOrdering)
    val multiCnts: Seq[(String, Long)] =
      multi0.toSeq.sortBy(t => (-t._2, t._1))(
        Ordering.Tuple2(Ordering.Long, Bpe.codePointOrdering))
    val (fc, fm) = emLoop(types, charCnts, multiCnts, maxPieceLen, emIters)
    CheckpointUtil.freeCheckpoint(types)
    pruneAndScore(fc, fm, vocabSize, maxPieceLen)
  }

  /** Hard EM over the word-TYPE table: segment under current scores
    * (scan-side Viterbi), re-count pieces weighted by word frequency
    * (one vocab-sized shuffle), drop unused multi-char pieces, floor
    * chars at 1 (required-character coverage). The trainer state is
    * exactly (charCnts, multiCnts) — a pure function of the inputs, so
    * continuation from a stored model is EXACT ([[learnContinue]]). */
  private def emLoop(types: DataFrame, charCnts0: Seq[(String, Long)],
      multiCnts0: Seq[(String, Long)], maxPieceLen: Int, emIters: Int)
      : (Seq[(String, Long)], Seq[(String, Long)]) = {
    def rescore(charCnts: Seq[(String, Long)],
        multiCnts: Seq[(String, Long)]): Array[(String, Long)] = {
      val total = charCnts.map(_._2).sum + multiCnts.map(_._2).sum
      (charCnts ++ multiCnts).map { case (p, c) =>
        p -> UnigramLm.scaledLogProb(c, total)
      }.toArray
    }
    var charCnts = charCnts0
    var multiCnts = multiCnts0
    (1 to emIters).foreach { _ =>
      val scores = rescore(charCnts, multiCnts)
      val seg = toColumn(UnigramSegmentExpr(scores.map(_._1),
        scores.map(_._2), maxPieceLen, toExpr(col("word"))))
      val used = types.select(explode(seg).as("piece"), col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      charCnts = charCnts.map { case (p, _) =>
        p -> math.max(used.getOrElse(p, 0L), 1L)
      }
      multiCnts = multiCnts
        .flatMap { case (p, _) => used.get(p).map(p -> _) }
        .sortBy(t => (-t._2, t._1))(
          Ordering.Tuple2(Ordering.Long, Bpe.codePointOrdering))
    }
    (charCnts, multiCnts)
  }

  /** Prune to the vocab budget and assign ids: chars first (code-point
    * order), then multi by (count desc, piece asc); scores renormalize
    * over the kept set. */
  private def pruneAndScore(charCnts: Seq[(String, Long)],
      multiCnts: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int): Model = {
    val keptMulti = multiCnts.take(math.max(vocabSize - charCnts.size, 0))
    val totalF = charCnts.map(_._2).sum + keptMulti.map(_._2).sum
    val entries = (charCnts ++ keptMulti).zipWithIndex.map {
      case ((p, c), i) =>
        PieceEntry(p, c, UnigramLm.scaledLogProb(c, totalF), i.toLong)
    }
    Model(entries.toIndexedSeq, maxPieceLen)
  }

  /** Resume hard EM from a stored model over a (possibly different)
    * corpus shard — the unigram arm of the continuation story
    * ([[Bpe.learnMergesContinue]] / [[Wordpiece.learnMergesContinue]]):
    * the piece INVENTORY is frozen (no re-seeding — a continuation must
    * never fork the id space the way a shard-local seed pass would),
    * counts re-estimate by `emIters` more Viterbi-count rounds starting
    * from the stored counts, unused multi-char pieces drop, and the
    * result re-prunes to `vocabSize` under the standard id rule.
    *
    * The stored model IS the trainer state: its entries carry exactly
    * the (piece, count) pairs [[emLoop]] folds over, chars already in
    * code-point order and multis by (count desc, piece asc) — so
    * `learnContinue(store(learn(c, n)), c, k)` on the same corpus equals
    * `learn` run for n+k iterations whenever the store's prune kept
    * everything (and is the gated q231 contract at the fixture
    * geometry). */
  def learnContinue(df: DataFrame, text: Column, model: Model,
      vocabSize: Int, emIters: Int = 1): Model = {
    require(emIters >= 1, "continuation needs at least one EM round")
    val types = wordTypes(df, text).localCheckpoint()
    val charCnts = model.entries.filter(_.piece.length == 1)
      .map(e => e.piece -> e.count)
    val multiCnts = model.entries.filter(_.piece.length >= 2)
      .map(e => e.piece -> e.count)
    val (fc, fm) =
      emLoop(types, charCnts, multiCnts, model.maxPieceLen, emIters)
    CheckpointUtil.freeCheckpoint(types)
    pruneAndScore(fc, fm, vocabSize, model.maxPieceLen)
  }

  /** The learned vocabulary as a DataFrame (piece, count, score,
    * piece_id) — the q199 gate surface. */
  def vocabTable(df: DataFrame, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    model.entries.map(e => (e.piece, e.count, e.score, e.id))
      .toDF("piece", "count", "score", "piece_id")
  }

  /** Deployment pruning of a learned or stored model — the vocabulary-
    * shrink lifecycle (a distilled serving model, an on-device table):
    * keep ALL single-char pieces (encode stays total — every in-alphabet
    * word still segments) plus the top `keepMulti` multi-char pieces by
    * (count DESC, piece ASC). Survivors keep their trained SCORES
    * (SentencePiece's deployment convention — log-probs are not
    * renormalized on prune) and their ORIGINAL IDS (pruning never
    * renumbers: shards encoded under the parent model stay valid, the
    * same stability contract as the byte-block rule). Pruning is pure
    * model surgery — no corpus pass. */
  def prune(model: Model, keepMulti: Int): Model = {
    require(keepMulti >= 0, "keepMulti must be >= 0")
    def nCp(p: String) = p.codePointCount(0, p.length)
    val chars = model.entries.filter(e => nCp(e.piece) == 1)
    val multi = model.entries.filter(e => nCp(e.piece) >= 2)
      .sortBy(e => (-e.count, e.piece)).take(keepMulti)
    Model((chars ++ multi).sortBy(_.id), model.maxPieceLen)
  }

  /** Encode documents to unigram piece-id sequences — [[Bpe.encode]]'s
    * exact scale shape (shared assembly): segmentation + id mapping over
    * word TYPES, corpus joins the (word → ids) table, one doc-keyed
    * regroup, sorted streaming array assembly. */
  def encode(df: DataFrame, idCol: String, text: Column, model: Model,
      unkId: Long = -1L): DataFrame = {
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
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
    val spark = df.sparkSession
    import spark.implicits._
    val idMap = model.entries.map(e => (e.piece, e.id))
      .toDF("__sym", "__sid")
    val wordIds = types
      .select(col("word"),
        posexplode(model.segmentCol(col("word"))).as(Seq("__sp", "__sym")))
      .join(broadcast(idMap), Seq("__sym"), "left")
      // a piece outside the vocab (an unknown char's fallback piece)
      // maps to unkId rather than silently dropping the position
      .select(col("word"), col("__sp"),
        coalesce(col("__sid"), lit(unkId)).as("__sid"))
      .groupBy("word")
      .agg(transform(array_sort(collect_list(struct(col("__sp"),
        col("__sid")))), x => x.getField("__sid")).as("__wids"))
    Bpe.assembleIds(df, idCol, text, wordIds)
  }

  /** [[encode]] with SentencePiece `--byte_fallback` semantics instead of
    * an unk id: a character absent from the piece table (the Viterbi
    * DP's single-char fallback arm) decomposes into its UTF-8 BYTES, each
    * mapped to a reserved byte-piece id `vocabSize + byte` — so every
    * input is representable and downstream detokenization is lossless,
    * the production convention for multilingual corpora where the learned
    * alphabet can never cover all of Unicode. Known pieces keep their
    * model ids; the fallback only fires where the DP already chose an
    * unknown single char. Same scale shape as [[encode]]: the per-symbol
    * byte expansion happens on the word-TYPE table, never the corpus. */
  def encodeByteFallback(df: DataFrame, idCol: String, text: Column,
      model: Model): DataFrame =
    encodeByteFallbackTokens(df, idCol, split(text, "\\s+"), model)

  /** [[encodeByteFallback]] over [[Bpe.losslessTokens]] under a
    * [[learnLossless]] model: whitespace rides inside the id stream
    * (space is an alphabet char, so it is always representable), every
    * non-space byte is representable via the fallback — [[decode]]
    * reconstructs the original text exactly. */
  def encodeLossless(df: DataFrame, idCol: String, text: Column,
      model: Model): DataFrame =
    encodeByteFallbackTokens(df, idCol, Bpe.losslessTokens(text), model)

  private def encodeByteFallbackTokens(df: DataFrame, idCol: String,
      tokens: Column, model: Model): DataFrame = {
    val v = model.entries.size.toLong
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
    val spark = df.sparkSession
    import spark.implicits._
    val idMap = model.entries.map(e => (e.piece, e.id))
      .toDF("__sym", "__sid")
    val wordIds = types
      .select(col("word"),
        posexplode(model.segmentCol(col("word"))).as(Seq("__sp", "__sym")))
      .join(broadcast(idMap), Seq("__sym"), "left")
      // known piece → its model id; unknown piece (always a single char,
      // by the DP's fallback contract) → one id per UTF-8 byte
      .select(col("word"), col("__sp"),
        when(col("__sid").isNotNull, array(col("__sid")))
          .otherwise(transform(Bpe.utf8ByteValues(col("__sym")),
            b => b + lit(v))).as("__pids"))
      .groupBy("word")
      .agg(flatten(transform(array_sort(collect_list(struct(col("__sp"),
        col("__pids")))), x => x.getField("__pids"))).as("__wids"))
    Bpe.assembleIdsTokens(df, idCol, tokens, wordIds)
  }

  /** Detokenization — the inverse of the byte-fallback encodes: ids
    * below vocabSize emit their piece's UTF-8 bytes, fallback ids emit
    * the byte `id − vocabSize`; the stream decodes as UTF-8. For
    * [[encodeLossless]] output this reconstructs the original text
    * byte-for-byte; for [[encodeByteFallback]] output it returns the
    * space-collapsed word stream. One doc's bytes in memory at a time. */
  def decode(encoded: DataFrame, idCol: String, idsCol: String,
      model: Model): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val v = model.entries.size.toLong
    val pieceBytes: Array[Array[Byte]] = model.entries
      .map(_.piece.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .toArray
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(pieceBytes)
    val outSchema = StructType(Seq(
      encoded.schema(idCol),
      StructField("text", StringType)))
    encoded.select(col(idCol), col(idsCol)).mapPartitions { it =>
      val tbl = bc.value
      it.map { r =>
        val ids = r.getSeq[Long](1)
        val buf = new java.io.ByteArrayOutputStream(ids.length * 2)
        ids.foreach { id =>
          if (id < v) buf.write(tbl(id.toInt))
          else buf.write((id - v).toInt)
        }
        Row(r.get(0),
          new String(buf.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Vocabulary-coverage report by group key — the companion diagnostic
    * to [[fertilityByKey]] for [[encodeByteFallback]] deployments: per
    * group, how much of the emitted id stream is byte-fallback (a high
    * `fallback_rate` means the learned vocabulary under-serves that
    * group's script/domain and its text costs fallback bytes instead of
    * learned pieces). Output: (key, n_words, n_ids, n_unk_pieces,
    * n_fallback_ids, fallback_rate) where n_ids counts the ids
    * [[encodeByteFallback]] would emit (known pieces 1 each, unknown
    * pieces their UTF-8 byte count) and fallback_rate =
    * n_fallback_ids / n_ids (rounded 6).
    *
    * Scale shape: [[Bpe.fertilityFromWordPieces]]'s — segmentation and
    * per-word stats over the word-TYPE table, the corpus token stream
    * joins the small table and aggregates straight to the group key. */
  def coverageByKey(df: DataFrame, text: Column, key: Column,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
    val pieces = model.entries.map(_.piece).toDF("__sym")
      .withColumn("__known", lit(true))
    val wordStats = types
      .select(col("word"),
        explode(model.segmentCol(col("word"))).as("__sym"))
      .join(broadcast(pieces), Seq("__sym"), "left")
      .groupBy("word")
      .agg(count(lit(1)).as("__p"),
        coalesce(sum(when(col("__known").isNull, 1L).otherwise(0L)),
          lit(0L)).as("__u"),
        coalesce(sum(when(col("__known").isNull,
          octet_length(col("__sym")).cast("long")).otherwise(0L)),
          lit(0L)).as("__fb"))
    df.select(key.as("key"), explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .join(wordStats, Seq("word"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_words"),
        sum(col("__p") - col("__u") + col("__fb")).as("n_ids"),
        sum(col("__u")).as("n_unk_pieces"),
        sum(col("__fb")).as("n_fallback_ids"))
      .withColumn("fallback_rate",
        round(col("n_fallback_ids") * lit(1.0) / col("n_ids"), 6))
  }

  /** Tokenizer fertility by group key under a unigram model — the same
    * vocabulary-budget diagnostic as [[Bpe.fertilityByKey]]. */
  def fertilityByKey(df: DataFrame, text: Column, key: Column,
      model: Model): DataFrame = {
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
    val wordPieces = types.select(col("word"),
      size(model.segmentCol(col("word"))).cast("long").as("__p"),
      length(col("word")).cast("long").as("__c"))
    Bpe.fertilityFromWordPieces(df, text, key, wordPieces)
  }
}
