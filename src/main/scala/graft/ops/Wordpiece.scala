package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpr}

import graft.core.WordpieceLm
import graft.expr.WordpieceSegmentExpr

/** WordPiece tokenizer (Schuster & Nakajima 2012; BERT's tokenizer) —
  * the third dominant subword family next to BPE ([[Bpe]]) and
  * unigram-LM ([[Unigram]]), completing the tokenizer triad.
  *
  * Learning is BPE-shaped (iterative pair merging over the word-TYPE
  * table) but ranks pairs by the LIKELIHOOD gain score
  * `count(pair) / (count(left) · count(right))` instead of raw count —
  * the classic WordPiece objective. Symbols carry the `##` continuation
  * marker (word-initial symbols are bare, inner symbols prefixed), and a
  * merge fuses `left + right-without-##`, preserving the left symbol's
  * position class. Application is NOT merge replay: it is greedy
  * longest-match-first over the final vocabulary with whole-word `[UNK]`
  * on any unmatched position ([[WordpieceLm.segment]]).
  *
  * Determinism contract: the only float is the pair score, computed as
  * the IDENTICAL IEEE-double expression (`cnt / (cl · cr)` on
  * exactly-representable longs) in both the engine and the DuckDB
  * oracle; ties break by (count desc, left, right). Vocabulary ids:
  * alphabet symbols first in code-point order, then merged symbols in
  * merge order (first occurrence wins on collisions).
  *
  * Scale shape (the 100 TB contract, mirroring [[Bpe]]/[[Unigram]]):
  * the corpus is scanned twice total (word-type counts + the encode
  * token explode); learning and segmentation run over the vocab-sized
  * word-type table; per merge round: one pair-count shuffle + one
  * symbol-count shuffle over that table and a 1-row argmax collect. */
object Wordpiece {

  /** One learned merge: the pair, the fused symbol, and its weighted
    * pair count when selected. */
  case class Merge(left: String, right: String, merged: String, freq: Long)

  /** A learned WordPiece tokenizer: `entries` = (piece, id) in id order;
    * `maxContentLen` = longest piece content (code points, `##`
    * excluded), the greedy matcher's start length. */
  case class Model(entries: IndexedSeq[(String, Long)],
      maxContentLen: Int) {
    def segmentCol(word: Column): Column =
      toColumn(WordpieceSegmentExpr(entries.map(_._1).toArray,
        maxContentLen, toExpr(word)))
  }

  /** Word-initial symbol bare, inner symbols `##`-prefixed. */
  def initSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i =>
      when(i === 1, word.substr(lit(1), lit(1)))
        .otherwise(concat(lit("##"), word.substr(i, lit(1)))))

  /** Greedy left-to-right application of ONE merge: adjacent (left,
    * right) fuses to `merged`. Same check-last fold as [[Bpe.mergeOnce]]
    * (a fused symbol never re-fuses as LEFT in the same round since
    * `merged` ≠ `left`). */
  private def mergeOnce(syms: Column, left: String, right: String,
      merged: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === left && x === right,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))

  private def stripCont(r: String): String =
    if (r.startsWith("##")) r.substring(2) else r

  /** Learn the first `k` WordPiece merges by likelihood score. Stops
    * early when no adjacent pair remains. */
  def learnMerges(corpus: DataFrame, textCol: String, k: Int): Seq[Merge] =
    learnMergesContinue(corpus, textCol, Nil, k)

  /** Continue WordPiece merge learning from an existing merge list —
    * [[Bpe.learnMergesContinue]]'s contract for the likelihood-scored
    * family: the ##-marked types fold under `existing` first (chunked),
    * then the scored loop runs `k` MORE rounds. Exact extension:
    * learn(a)+continue(b) ≡ learn(a+b) (spec-pinned, gate q222). */
  def learnMergesContinue(corpus: DataFrame, textCol: String,
      existing: Seq[Merge], k: Int): Seq[Merge] = {
    require(k >= 1, "k must be >= 1")
    var state = Bpe.wordCounts(corpus, textCol)
      .select(initSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    existing.grouped(16).foreach { grp =>
      val prev = state
      state = state.select(grp.foldLeft(col("syms")) { (c, m) =>
        mergeOnce(c, m.left, m.right, m.merged) }.as("syms"), col("freq"))
        .localCheckpoint()
      CheckpointUtil.freeCheckpoint(prev)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.length < k && !exhausted) {
      // current symbol frequencies (the score denominators) — one
      // vocab-sized shuffle
      val symCnt = state
        .select(explode(col("syms")).as("s"), col("freq"))
        .groupBy("s").agg(sum("freq").as("c"))
      val top = state
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          j => struct(element_at(col("syms"), j + 1).as("l"),
            element_at(col("syms"), j + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .join(symCnt.select(col("s").as("l"), col("c").as("cl")), Seq("l"))
        .join(symCnt.select(col("s").as("r"), col("c").as("cr")), Seq("r"))
        // IEEE-double score, the identical expression the oracle runs:
        // long inputs are exactly representable, the product and the
        // division each round once, the same way, in both engines
        .withColumn("score", col("cnt").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(desc("score"), desc("cnt"), col("l"), col("r"))
        .limit(1).select("l", "r", "cnt").collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val m = Merge(l, r, l + stripCont(r), top(0).getLong(2))
        merges += m
        val prev = state
        state = state.select(
          mergeOnce(col("syms"), m.left, m.right, m.merged).as("syms"),
          col("freq")).localCheckpoint()
        CheckpointUtil.freeCheckpoint(prev)
      }
    }
    CheckpointUtil.freeCheckpoint(state)
    merges.toSeq
  }

  /** Induce the model (id space + matcher geometry) for a corpus and
    * merge list: alphabet symbols (bare first chars ∪ `##`-inner chars
    * of the word types) in code-point order take ids 0..A−1, merged
    * symbols follow in merge order (first occurrence wins — a merge can
    * collide with the alphabet only on corpora containing literal `#`
    * runs, but the rule is total either way). */
  def model(df: DataFrame, text: Column, merges: Seq[Merge]): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val alpha = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .select(explode(initSymbols(col("word"))).as("symbol"))
      .distinct()
      .as[String].collect().sorted(Bpe.codePointOrdering)
    val seen = scala.collection.mutable.LinkedHashSet(alpha.toSeq: _*)
    merges.foreach(m => seen += m.merged)
    val entries = seen.toIndexedSeq.zipWithIndex
      .map { case (p, i) => (p, i.toLong) }
    val maxContent = entries.map { case (p, _) =>
      val c = stripCont(p)
      c.codePointCount(0, c.length)
    }.max
    Model(entries, maxContent)
  }

  /** The learned vocabulary as a DataFrame (piece, piece_id). */
  def vocabTable(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.entries.toDF("piece", "piece_id")
  }

  /** Encode documents to WordPiece piece-id sequences —
    * [[Bpe.encode]]'s exact scale shape (shared assembly): greedy
    * segmentation + id mapping over word TYPES, corpus joins the
    * (word → ids) table, one doc-keyed regroup, sorted streaming array
    * assembly. `[UNK]` pieces map to `unkId`. */
  def encode(df: DataFrame, idCol: String, text: Column, m: Model,
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
    val idMap = m.entries.toDF("__sym", "__sid")
    val wordIds = types
      .select(col("word"),
        posexplode(m.segmentCol(col("word"))).as(Seq("__sp", "__sym")))
      .join(broadcast(idMap), Seq("__sym"), "left")
      .select(col("word"), col("__sp"),
        coalesce(col("__sid"), lit(unkId)).as("__sid"))
      .groupBy("word")
      .agg(transform(array_sort(collect_list(struct(col("__sp"),
        col("__sid")))), x => x.getField("__sid")).as("__wids"))
    Bpe.assembleIds(df, idCol, text, wordIds)
  }

  /** Detokenization for WordPiece id streams — the `##`-strip join a
    * BERT-style consumer expects: a bare piece opens a new word (single
    * space separator), a `##`-piece concatenates onto the current word.
    * LOSSY by design, twice over (documented, not fixable within the
    * WordPiece contract): (a) an `[UNK]`-collapsed word renders as the
    * literal `unk` string — the original bytes are gone at encode time;
    * (b) whitespace runs collapse to single spaces (encode splits on
    * `\s+`). On text the model's alphabet fully covers, no `[UNK]`
    * fires and `decode(encode(text))` equals the whitespace-collapsed
    * original EXACTLY (the q232 gate); for byte-exact round-trips use
    * the byte-mode BPE or lossless-unigram pairs instead.
    *
    * Same kernel shape as [[Bpe.decodeBytes]]: the id→piece table
    * broadcasts (vocabulary-sized), reconstruction is one per-row pass,
    * never shuffles, one doc's text in memory at a time. Ids absent
    * from the vocabulary (e.g. [[encode]]'s `unkId`) render as `unk`. */
  def decode(encoded: DataFrame, idCol: String, idsCol: String, m: Model,
      unk: String = "[UNK]"): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(
      m.entries.map { case (p, i) => i -> p }.toMap)
    val outSchema = StructType(Seq(
      encoded.schema(idCol),
      StructField("text", StringType)))
    encoded.select(col(idCol), col(idsCol)).mapPartitions { it =>
      val tbl = bc.value
      it.map { r =>
        val ids = r.getSeq[Long](1)
        val sb = new java.lang.StringBuilder(ids.length * 4)
        ids.foreach { id =>
          val piece = tbl.getOrElse(id, unk)
          if (piece.startsWith("##")) sb.append(piece, 2, piece.length)
          else {
            if (sb.length > 0) sb.append(' ')
            sb.append(piece)
          }
        }
        Row(r.get(0), sb.toString)
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Tokenizer fertility by group key under a WordPiece model — the
    * same vocabulary-budget diagnostic as [[Bpe.fertilityByKey]] (an
    * `[UNK]`-collapsed word counts as ONE piece). */
  def fertilityByKey(df: DataFrame, text: Column, key: Column,
      m: Model): DataFrame = {
    val types = df
      .select(explode(split(text, "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .distinct()
    val wordPieces = types.select(col("word"),
      size(m.segmentCol(col("word"))).cast("long").as("__p"),
      length(col("word")).cast("long").as("__c"))
    Bpe.fertilityFromWordPieces(df, text, key, wordPieces)
  }
}
