package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction and application — the token-frequency side of
  * tokenizer design (BPE merge learning lives in [[Bpe]]; this is the
  * word/type-level vocabulary a pipeline builds to budget token counts,
  * choose vocab sizes, and encode corpora to id sequences).
  *
  * Scale shape: everything here reduces to ONE (token) count shuffle over
  * the corpus; the vocabulary table that comes out is type-count sized
  * (≤ maxSize rows), corpus-size independent, and every downstream step
  * (ranking, coverage curve, encode-join) works off that small table —
  * ranking windows run over the vocabulary, never the corpus, and
  * [[encode]] broadcasts the vocabulary to the token stream.
  *
  * Determinism: ranks tie-break on (count DESC, token ASC), so the
  * vocabulary — and with it every encoded id — is reproducible across runs
  * and partitionings.
  */
object Vocab {

  /** Frequency vocabulary over whitespace tokens: the top-`maxSize` token
    * types with count ≥ `minCount`, ranked densely by (count DESC, token
    * ASC). Output: (token, token_id, n) with ids 0..V−1.
    *
    * One corpus-sized count shuffle. The global rank is a TWO-LEVEL scan,
    * not a partition-less `row_number` window (which funnels the whole
    * type table through one task): range-partition the count table by the
    * rank order itself, freeze the layout (localCheckpoint — the bucket
    * assignment must be identical in the size-count job and the final
    * plan), collect the per-partition row counts (≤ shuffle-partitions
    * rows), and add each partition's broadcast prefix offset to a
    * partition-LOCAL row_number. Same scheme as
    * [[Packing.withPrefixSum]], adapted to a composite (n DESC, token
    * ASC) key that a numeric bucket boundary cannot express but a range
    * partitioner can — and because the partitioner splits the huge tied
    * n=1 tail across partitions by token, Zipfian skew cannot recreate
    * the single-task bottleneck. Exact for any partitioning. */
  def build(df: DataFrame, text: Column, minCount: Long = 1L,
      maxSize: Long = Long.MaxValue): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(maxSize >= 1, "maxSize must be >= 1")
    val counts = df
      .select(explode(split(text, "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
    val parts = math.max(2,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = counts
      .repartitionByRange(parts, col("n").desc, col("token"))
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val sizes = ranged.groupBy("__bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxB = if (sizes.isEmpty) 0 else sizes.keys.max
    val offsets = new Array[Long](maxB + 1)
    var acc = 0L
    (0 to maxB).foreach { b => offsets(b) = acc; acc += sizes.getOrElse(b, 0L) }
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col("n").desc, col("token"))
    ranged
      .withColumn("token_id",
        (row_number().over(w) - 1).cast("long") + element_at(
          array(offsets.map(lit).toIndexedSeq: _*), col("__bkt") + 1))
      .where(col("token_id") < maxSize)
      .select(col("token"), col("token_id").cast("long").as("token_id"),
        col("n"))
  }

  /** Encode documents to id sequences under a [[build]]-shaped vocabulary
    * table (token, token_id, …): whitespace tokens map to their ids, OOV
    * tokens to `unkId`. Output: original id column + `ids` array.
    *
    * Scale shape: the corpus explodes to (doc, pos, token) AT THE SCAN
    * (no pre-shuffle), the vocabulary — small by construction — broadcast
    * joins onto the token stream map-side, and the only shuffle regroups
    * (doc, pos, int-id) triples, i.e. ships 12-byte ids instead of token
    * text. Array assembly is a SORTED STREAMING walk (repartition by doc,
    * sort by (doc, pos), one doc's ids in memory at a time) — a
    * collect_list aggregation holds every in-flight group's buffer on the
    * heap and OOMs at the billion-token scale (measured: 33M docs × 30
    * tokens on an 8 GB executor heap). Empty/null docs yield empty
    * arrays, preserving corpus rows. */
  def encode(df: DataFrame, idCol: String, text: Column,
      vocab: DataFrame, unkId: Long = -1L): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    val toks = df.select(col(idCol),
        posexplode_outer(split(text, "\\s+")).as(Seq("__pos", "__tok")))
    val mapped = toks.join(
        broadcast(vocab.select(col("token").as("__tok"),
          col("token_id").as("__tid"))),
        Seq("__tok"), "left")
      .select(col(idCol), col("__pos"),
        when(col("__tok").isNull || length(col("__tok")) === 0, lit(null))
          .otherwise(coalesce(col("__tid"), lit(unkId))).as("__tid"))
    val outSchema = StructType(Seq(
      mapped.schema.fields(0),
      StructField("ids", ArrayType(LongType, containsNull = false))))
    mapped
      .repartition(col(idCol))
      .sortWithinPartitions(col(idCol), col("__pos"))
      .mapPartitions { it =>
        // NB the name: inside an Iterator subclass, a bare `buffered`
        // resolves to the INHERITED Iterator.buffered method (self-wrap →
        // infinite recursion), so the upstream iterator gets a distinct name
        val in = it.buffered
        new Iterator[Row] {
          def hasNext: Boolean = in.hasNext
          def next(): Row = {
            val id = in.head.get(0)
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (in.hasNext && in.head.get(0) == id) {
              val r = in.next()
              if (!r.isNullAt(2)) ids += r.getLong(2)
            }
            Row(id, ids.toSeq)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Vocabulary coverage curve (the Zipf head/tail question): for each
    * checkpoint rank N in `ranks`, the fraction of all token OCCURRENCES
    * covered by the top-N token types, plus the OOV rate a vocab of size N
    * would pay. Output: (vocab_size, covered, total, coverage) ordered by
    * vocab_size — the table a team reads to pick a vocabulary size.
    *
    * Same single count shuffle as [[build]]; the prefix sum runs over the
    * vocabulary-sized ranked table, and checkpoints join against that
    * cumulative table — nothing here rescans the corpus. */
  def coverage(df: DataFrame, text: Column, ranks: Seq[Long]): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(_ >= 1), "ranks must be >= 1")
    // distributed prefix sum (Packing's two-level scan) instead of a
    // global single-partition window: the ranked table is vocab-sized,
    // but a web-scale vocabulary is still millions of rows — no reason
    // to funnel it through one task
    val ranked = Packing.withPrefixSum(build(df, text), "token_id", "n",
        "__cumd")
      .withColumn("cum", col("__cumd").cast("long")).drop("__cumd")
    val total = ranked.agg(coalesce(sum(col("n")), lit(0L)).as("t"))
    val session = df.sparkSession
    import session.implicits._
    val checkpoints = ranks.distinct.sorted
      .toDF("vocab_size").select(col("vocab_size").cast("long"))
    // per checkpoint: the cumulative count at the largest rank ≤ N — a
    // vocab-sized range join on the small ranked table
    checkpoints.join(ranked, col("token_id") < col("vocab_size"), "left")
      .groupBy("vocab_size")
      .agg(coalesce(max(col("cum")), lit(0L)).as("covered"))
      .crossJoin(broadcast(total))
      .select(col("vocab_size"), col("covered"), col("t").as("total"),
        round(col("covered") / greatest(col("t"), lit(1L)), 9)
          .as("coverage"))
      .orderBy("vocab_size")
  }

  /** Bigram conditional entropy of an encoded token stream —
    * `H(next | cur) = −Σ p(cur,next) · ln(c(cur,next)/c(cur))` over
    * within-document adjacent pairs (never across documents), next to
    * the context-marginal entropy `H(cur)`: together they say how much
    * of the stream a 1-token context already predicts — the
    * entropy-rate diagnostic for comparing tokenizers or spotting
    * templated/repetitive corpora (H_cond ≪ H_uni). Pairs explode
    * scan-side; ONE (cur, next)-keyed count shuffle (map-side
    * combined); the marginal is a window over the CELL frame, never
    * the corpus. Returns one row:
    * (n_bigrams, n_contexts, n_cells, h_cond, h_unigram). */
  def conditionalEntropy(encoded: DataFrame,
      idsCol: Column): DataFrame = {
    val pairs = encoded.where(size(idsCol) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(idsCol) - 1),
        i => struct(
          element_at(idsCol, i.cast("int")).as("cur"),
          element_at(idsCol, (i + 1).cast("int")).as("nxt"))))
        .as("__p"))
      .select(col("__p.cur").as("__cur"), col("__p.nxt").as("__nxt"))
    val cells = pairs.groupBy("__cur", "__nxt")
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__cur")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val m = cells.withColumn("__cc", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val c = col("__c").cast("double")
    val n = col("__n").cast("double")
    val cc = col("__cc").cast("double")
    m.agg(max(col("__n")).as("n_bigrams"),
      countDistinct(col("__cur")).as("n_contexts"),
      count(lit(1)).as("n_cells"),
      (-graft.api.functions.exact_sum((c / n) * log(c / cc)))
        .as("h_cond"),
      (-graft.api.functions.exact_sum((c / n) * log(cc / n)))
        .as("h_unigram"))
  }

  /** Rényi tokenizer efficiency (Zouhar et al. 2023, "Tokenization and
    * the Noiseless Channel"): over an ENCODED corpus, the Rényi
    * entropy of the token-unigram distribution,
    * `H_α = ln(Σ p_i^α) / (1 − α)` (α = 2.5 per the paper — the best
    * predictor of downstream quality among tokenizer-intrinsic
    * metrics), plus Shannon H and the normalized efficiency
    * `H_α / ln(vocab_used)` — a tokenizer whose ids are used evenly
    * scores 1. One row: (n_tokens, vocab_used, h_renyi, h_shannon,
    * efficiency). One token-keyed shuffle to counts (map-side
    * combined), then a vocab-sized fold through
    * [[graft.api.functions.exact_sum]]. */
  def renyiEfficiency(encoded: DataFrame, idsCol: Column,
      alpha: Double = 2.5): DataFrame = {
    require(alpha > 0 && alpha != 1.0,
      "alpha must be positive and != 1 (use h_shannon for the limit)")
    val cnt = encoded.select(explode(idsCol).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val tot = cnt.agg(sum(col("__c")).as("__n"),
      count(lit(1)).as("__v"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    cnt.crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n_tokens"),
        max(col("__v")).as("vocab_used"),
        (log(graft.api.functions.exact_sum(pow(p, alpha)))
          * lit(1.0 / (1.0 - alpha))).as("h_renyi"),
        (-graft.api.functions.exact_sum(p * log(p))).as("h_shannon"))
      .withColumn("efficiency",
        col("h_renyi") / log(col("vocab_used").cast("double")))
  }
}
