package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A reserved special-token id block: `pieces(i)` owns id `i`, and every
  * CONTENT id from the underlying tokenizer shifts up by
  * [[SpecialTokens.reserve]]. Reserving the PREFIX (rather than
  * appending ids after the vocab) keeps special ids independent of vocab
  * size — a grown vocab, a continued training run, or a byte-mode base
  * space all leave `<pad>`=0, `<bos>`=1, ... untouched, which is the
  * property downstream training configs hard-code.
  *
  * The block is MODEL STATE: an encode and its decode must agree on the
  * offset, so [[TokenizerStore.saveSpecials]] persists it next to the
  * model tables and shard consumers read it from the layout, never from
  * convention. */
case class SpecialTokens(pieces: IndexedSeq[String]) {
  require(pieces.nonEmpty, "at least one special token")
  require(pieces.distinct.size == pieces.size,
    s"duplicate special pieces in $pieces")

  /** Width of the reserved id block; content ids shift by this. */
  def reserve: Long = pieces.size.toLong

  def id(piece: String): Long = {
    val i = pieces.indexOf(piece)
    require(i >= 0, s"'$piece' is not one of this block's specials " +
      s"(${pieces.mkString(", ")})")
    i.toLong
  }

  def padId: Long = id(SpecialTokens.Pad)
  def bosId: Long = id(SpecialTokens.Bos)
  def eosId: Long = id(SpecialTokens.Eos)
  def unkId: Long = id(SpecialTokens.Unk)
}

object SpecialTokens {
  val Pad = "<pad>"
  val Bos = "<bos>"
  val Eos = "<eos>"
  val Unk = "<unk>"
  val End = "<|end|>"

  /** The conventional four-id block: pad=0, bos=1, eos=2, unk=3. */
  val Default: SpecialTokens = SpecialTokens(Vector(Pad, Bos, Eos, Unk))

  /** The SFT/chat block: [[Default]] plus `<|role|>` turn markers and the
    * per-turn `<|end|>` terminator (pad=0 bos=1 eos=2 unk=3 system=4
    * user=5 assistant=6 end=7; content ids shift by 8). Role-marker
    * pieces follow the `<|name|>` convention [[Chat.roleId]] reads. */
  val Chat: SpecialTokens = SpecialTokens(Vector(Pad, Bos, Eos, Unk,
    "<|system|>", "<|user|>", "<|assistant|>", End))
}

/** Column-level special-token arithmetic over `array<long>` id streams
  * (the output shape of every graft encode). Pure built-in expressions —
  * wrapping, stripping, and padding all stay inside whole-stage codegen,
  * so a 100-shard encode job pays zero extra passes for specials. */
object Specials {

  /** Shift content ids into the reserved-block convention and wrap the
    * sequence with bos/eos: `[bos] ++ (ids + reserve) ++ [eos]`. An
    * empty content sequence wraps to the bare `[bos, eos]` frame. */
  def wrap(ids: Column, specials: SpecialTokens, bos: Boolean = true,
      eos: Boolean = true): Column = {
    val shifted = transform(ids, x => x + lit(specials.reserve))
    val front =
      if (bos) concat(array(lit(specials.bosId)), shifted) else shifted
    if (eos) concat(front, array(lit(specials.eosId))) else front
  }

  /** Exact inverse of [[wrap]] for the decode path: drop every id in the
    * reserved block (bos/eos/pad — whatever landed in the stream) and
    * shift the rest back to raw tokenizer ids. */
  def strip(ids: Column, specials: SpecialTokens): Column =
    transform(filter(ids, x => x >= lit(specials.reserve)),
      x => x - lit(specials.reserve))

  /** Fixed-length training rows: truncate to `seqLen`, then right-pad
    * with the block's pad id. Expects [[wrap]]ed input (pad id only
    * means "pad" under the reserved convention). */
  def padTo(ids: Column, specials: SpecialTokens, seqLen: Int): Column = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val cut = slice(ids, 1, seqLen)
    concat(cut, array_repeat(lit(specials.padId),
      greatest(lit(0), lit(seqLen) - size(cut))))
  }
}
