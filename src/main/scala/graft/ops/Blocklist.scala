package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField}
import graft.core.AhoCorasick

/** Blocklist / banned-phrase filtering — the C4/RefinedWeb-style "badwords"
  * stage, done right at scale: one Aho–Corasick pass per document finds all
  * occurrences of all patterns at O(text + matches), so a 10k-phrase
  * blocklist costs the same scan as a 10-phrase one (a per-pattern
  * contains() loop is O(patterns × text) and is exactly what this replaces).
  *
  * The automaton builds once on the driver from the pattern list
  * (vocabulary-bounded data, the NB-model/BPE-vocab contract) and is
  * broadcast; both transforms below are partition-local — no shuffle, no
  * UDF registration, schema preserved — so they compose with any upstream
  * partitioning and push no work to the driver.
  */
object Blocklist {

  private def bcAutomaton(df: DataFrame, patterns: Seq[String]) =
    df.sparkSession.sparkContext.broadcast(AhoCorasick.build(patterns))

  /** Append `n_matches` (total occurrences of all patterns, overlaps
    * included) and `n_patterns` (distinct patterns present) to every row.
    * Null text → 0/0. */
  def matchStats(df: DataFrame, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val bc = bcAutomaton(df, patterns)
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema
      .add(StructField("n_matches", LongType, nullable = false))
      .add(StructField("n_patterns", IntegerType, nullable = false))
    df.as(Encoders.row(df.schema)).mapPartitions { rows =>
      val ac = bc.value
      rows.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        val (total, distinct) =
          if (t == null) (0L, 0) else ac.matchStats(t)
        Row.fromSeq(r.toSeq :+ total :+ distinct)
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Drop every row whose text contains ANY pattern — the hard filter.
    * Early-exits per document at the first hit; clean documents pay one
    * linear scan. Null text passes (nothing to block). */
  def filterBlocked(df: DataFrame, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val bc = bcAutomaton(df, patterns)
    val idx = df.schema.fieldIndex(textCol)
    df.as(Encoders.row(df.schema)).mapPartitions { rows =>
      val ac = bc.value
      rows.filter(r => r.isNullAt(idx) || !ac.containsAny(r.getString(idx)))
    }(Encoders.row(df.schema)).toDF()
  }
}
