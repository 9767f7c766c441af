package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT/chat-template rendering — the serialization step between a
  * conversation table and the trainer: each conversation's turns become
  * one training string with role markers, and the byte positions a
  * loss-masked trainer needs (loss on assistant content only) come out
  * alongside as exact character spans.
  *
  * Template (fixed, documented): every turn renders as
  * `<|role|>\n` + content + `\n<|end|>\n`; spans use 0-based [start, end)
  * character offsets into the rendered string and cover exactly the
  * assistant turns' content.
  *
  * Scale shape: per-turn piece lengths are scan-side arithmetic; offsets
  * are a prefix sum over the turn index WITHIN each conversation
  * (conversation-length bounded — the scale axis is conversation count);
  * one (conversation)-keyed shuffle assembles text and spans. No RNG, no
  * UDFs — any engine renders byte-identical strings.
  */
object Chat {

  /** Render conversations to training strings + loss-mask spans.
    *
    * @param df       one row per turn
    * @param convCol  conversation id column name
    * @param turnCol  turn order column name (unique within conversation)
    * @param roleCol  role column name ("system"/"user"/"assistant"/…)
    * @param contentCol content column name
    * @return (convCol, text, n_turns, n_mask_chars, mask_spans) — spans
    *         serialized "start:end,start:end" in turn order ("" when no
    *         assistant turns), so the receipt is engine-comparable as a
    *         plain string. */
  def render(df: DataFrame, convCol: String, turnCol: String,
      roleCol: String, contentCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val marker = concat(lit("<|"), col(roleCol), lit("|>\n"))
    val piece = concat(marker, col(contentCol), lit("\n<|end|>\n"))
    val wSeq = Window.partitionBy(convCol).orderBy(turnCol)
    val offset = coalesce(sum(length(piece).cast("long"))
      .over(wSeq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val maskStart = offset + length(marker).cast("long")
    val maskEnd = maskStart + length(col(contentCol)).cast("long")
    val isAssistant = col(roleCol) === "assistant"
    val rows = df.select(col(convCol), col(turnCol).as("__t"),
      piece.as("__piece"),
      when(isAssistant,
        concat(maskStart.cast("string"), lit(":"),
          maskEnd.cast("string"))).as("__span"),
      when(isAssistant, length(col(contentCol)).cast("long"))
        .otherwise(lit(0L)).as("__mc"))
    rows.groupBy(convCol).agg(
      array_join(transform(array_sort(collect_list(struct(col("__t"),
        col("__piece").as("__p")))), x => x.getField("__p")), "")
        .as("text"),
      count(lit(1)).as("n_turns"),
      sum(col("__mc")).as("n_mask_chars"),
      array_join(transform(filter(array_sort(collect_list(struct(col("__t"),
        col("__span").as("__s")))), x => x.getField("__s").isNotNull),
        x => x.getField("__s")), ",").as("mask_spans"))
  }
}
