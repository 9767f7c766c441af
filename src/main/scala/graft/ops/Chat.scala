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

  /** Role-marker id under a specials block: the piece for role `r` is
    * `<|r|>` ([[SpecialTokens.Chat]]'s convention). An input role with no
    * marker piece raises at execution — a silently-null role id would
    * null the whole sample's id array, which is exactly the failure mode
    * a 100-shard encode job must not hide. */
  def roleId(role: Column, specials: SpecialTokens): Column = {
    val rolePieces = specials.pieces.zipWithIndex.collect {
      case (p, i) if p.startsWith("<|") && p.endsWith("|>") &&
          p != SpecialTokens.End =>
        (p.substring(2, p.length - 2), i.toLong)
    }
    require(rolePieces.nonEmpty,
      s"specials block ${specials.pieces} has no <|role|> marker pieces")
    rolePieces.tail.foldLeft(
        when(role === rolePieces.head._1, lit(rolePieces.head._2))) {
        case (acc, (r, i)) => acc.when(role === r, lit(i))
      }
      .otherwise(raise_error(concat(lit("unknown chat role: "), role))
        .cast("long"))
  }

  /** Token-level SFT sample assembly — the id-space counterpart of
    * [[render]]: each conversation's PRE-ENCODED turns (raw tokenizer ids
    * per turn, any graft encode) become one training id sequence plus an
    * aligned loss mask.
    *
    * Layout (fixed, documented): `[bos] ++ Σ_turns([<|role|>] ++
    * (ids + reserve) ++ [<|end|>]) ++ [eos]`. The loss mask is 1 on
    * `lossRole` turns' content ids AND that turn's `<|end|>` (the model
    * must learn to stop), 0 on everything else — bos/eos, role markers,
    * and non-`lossRole` content.
    *
    * Raw-id contract: pass the encode's `unkId` as
    * `specials.unkId - specials.reserve` so an unknown piece lands ON the
    * block's `<unk>` after the shift (the gate wiring in SparkEntry does
    * exactly this).
    *
    * Scale shape: [[render]]'s — per-turn arrays are scan-side
    * expressions; ONE conversation-keyed shuffle assembles ids and mask
    * (conversation-length bounded state, the scale axis is conversation
    * count). No UDFs, no RNG.
    *
    * @return (convCol, input_ids array<long>, loss_mask array<int>,
    *         n_tokens, n_loss) */
  def encodeTurns(df: DataFrame, convCol: String, turnCol: String,
      roleCol: String, idsCol: String,
      specials: SpecialTokens = SpecialTokens.Chat,
      lossRole: String = "assistant"): DataFrame = {
    val endId = specials.id(SpecialTokens.End)
    val rid = roleId(col(roleCol), specials)
    val shifted = transform(col(idsCol), x => x + lit(specials.reserve))
    val piece = concat(array(rid), shifted, array(lit(endId)))
    val loss = (col(roleCol) === lossRole).cast("int")
    val maskPiece = concat(array(lit(0)),
      array_repeat(loss, size(col(idsCol))), array(loss))
    val rows = df.select(col(convCol), col(turnCol).as("__t"),
      piece.as("__ids"), maskPiece.as("__m"))
    def ordered(c: String) = flatten(transform(
      array_sort(collect_list(struct(col("__t"), col(c).as("__p")))),
      x => x.getField("__p")))
    rows.groupBy(convCol).agg(
      concat(array(lit(specials.bosId)), ordered("__ids"),
        array(lit(specials.eosId))).as("input_ids"),
      concat(array(lit(0)), ordered("__m"), array(lit(0)))
        .as("loss_mask"))
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
      .withColumn("n_loss",
        aggregate(col("loss_mask"), lit(0L), (a, x) => a + x))
  }

  /** Preference-pair construction — DPO/RLHF dataset prep: within each
    * candidate group (the rows sharing `groupCol`, e.g. responses to one
    * prompt), pick the highest-scoring row as `chosen` and the
    * lowest-scoring as `rejected`, deterministically: chosen maximizes
    * `(score, −id)` (score ties → LOWEST id), rejected minimizes
    * `(score, −id)` (score ties → HIGHEST id), so the two tie rules can
    * only collide when every candidate is one row. Groups with fewer
    * than 2 candidates, or where chosen == rejected, are dropped; pairs
    * with `margin = 0` (an all-tied group) survive with margin 0 for the
    * caller to threshold — dropping them silently would hide annotation
    * pathologies.
    *
    * Scale shape: ONE group-keyed aggregation (codegen'd `max_by`/
    * `min_by` over constant-size structs — no window, no sort, map-side
    * partial aggregation); candidate text/ids never move, only
    * (group, id, score) triples shuffle.
    *
    * @return (groupCol, chosen_id, rejected_id, chosen_score,
    *         rejected_score, margin, n_candidates) */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(
        max_by(col(idCol), struct(col(scoreCol), -col(idCol)))
          .as("chosen_id"),
        min_by(col(idCol), struct(col(scoreCol), -col(idCol)))
          .as("rejected_id"),
        max(col(scoreCol)).as("chosen_score"),
        min(col(scoreCol)).as("rejected_score"),
        count(lit(1)).as("n_candidates"))
      .where(col("n_candidates") >= 2 &&
        col("chosen_id") =!= col("rejected_id"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))

  /** Fixed-length training rows from an [[encodeTurns]] pair: truncate
    * ids AND mask to `seqLen`, right-pad ids with the block's pad id and
    * the mask with 0, and emit the attention mask (1 on real positions,
    * 0 on pads) — the (input_ids, loss_mask, attention_mask) triple a
    * trainer's collator expects, as one scan-side struct column. */
  def padSample(ids: Column, mask: Column, specials: SpecialTokens,
      seqLen: Int): Column = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val cut = slice(ids, 1, seqLen)
    val padN = greatest(lit(0), lit(seqLen) - size(cut))
    struct(
      concat(cut, array_repeat(lit(specials.padId), padN))
        .as("input_ids"),
      concat(slice(mask, 1, seqLen), array_repeat(lit(0), padN))
        .as("loss_mask"),
      concat(array_repeat(lit(1), size(cut)), array_repeat(lit(0), padN))
        .as("attention_mask"))
  }
}
