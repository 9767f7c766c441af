package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: term/document frequencies and TF-IDF term
  * ranking — the classic vocabulary/feature-extraction pass of a text
  * pipeline.
  *
  * Scale shape: one explode (rows = token occurrences, but each row is a
  * short string + id, not the document), one (doc, term) aggregation, one
  * term-keyed join for document frequencies, and a per-doc top-k window
  * that Spark executes as WindowGroupLimit (per-partition k-row heaps
  * before the shuffle). Nothing materializes per-document vocabularies on
  * the driver.
  */
object Text {

  /** (doc, term, tf): whitespace-token term frequencies per document. */
  def docTermFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))

  /** Classic smoothed TF-IDF score: tf · (ln((N+1)/(df+1)) + 1). */
  def tfidfScore(tf: Column, df: Column, nDocs: Long): Column =
    tf * (log(lit(nDocs + 1.0) / (df + 1.0)) + 1.0)

  /** Top-k most distinctive terms per document, ranked by the exact
    * rational tf/df (monotone in tf and 1/df like tf·idf, but free of
    * transcendental rounding — the ranking is bit-reproducible across
    * engines); ties by higher tf, then term. Returns
    * (idCol, term, tf, df, rank) with rank in 1..k. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = docTermFrequencies(df, idCol, textCol)
    // df(term) = number of documents containing the term: (doc, term) rows
    // are unique after the tf aggregation, so a plain count suffices
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc")
      .orderBy((col("tf").cast("double") / col("df")).desc,
        col("tf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc").as(idCol), col("term"), col("tf"), col("df"),
        col("rank"))
  }
}
