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
  def learnMerges(corpus: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    require(k >= 1, "k must be >= 1")
    var state = wordCounts(corpus, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
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

  private def freeCheckpoint(df: DataFrame): Unit =
    CheckpointUtil.freeCheckpoint(df)
}
