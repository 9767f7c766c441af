package graft.core

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer kernels (Schuster & Nakajima 2012; the BERT
  * tokenizer family — the third dominant subword family next to BPE
  * ([[graft.ops.Bpe]]) and unigram-LM ([[UnigramLm]])).
  *
  * Segmentation is greedy longest-match-first over a FIXED vocabulary:
  * at the word start the candidate is the raw prefix, at every later
  * position the candidate is `"##" + substring` (the continuation
  * convention); at each step the longest vocabulary hit wins, and a word
  * with ANY unmatched position collapses to the single `[UNK]` piece
  * (the WordPiece whole-word-unk rule, unlike unigram's per-char
  * fallback).
  *
  * Determinism contract (what the DuckDB oracle replays): greedy
  * longest-match has no scores at apply time — the only float in the
  * family is the learn-time pair ranking in [[graft.ops.Wordpiece]],
  * computed as the identical IEEE double expression in both engines.
  * Positions are Unicode CODE POINTS for the same reason as
  * [[UnigramLm.segment]] (DuckDB slices by code point).
  */
object WordpieceLm {
  /** The piece emitted for a word with an unmatchable position. Not part
    * of any learned vocabulary — id mapping sends it to `unkId`. */
  val UnkPiece: String = "[UNK]"

  /** Greedy longest-match segmentation of `word` under `vocab`.
    * `maxContentLen` bounds the CONTENT length (code points, excluding
    * the `##` marker) of any vocabulary piece — match attempts start
    * there and shrink. Runs over word TYPES only (vocabulary-sized
    * tables), never the corpus. */
  def segment(word: String, vocab: java.util.HashSet[String],
      maxContentLen: Int): Array[String] = {
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty
    val offs = new Array[Int](n + 1)
    var o = 0
    var ci = 0
    while (ci < n) {
      offs(ci) = o; o += Character.charCount(cps(ci)); ci += 1
    }
    offs(n) = o
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      var l = math.min(maxContentLen, n - pos)
      var hit: String = null
      var hitLen = 0
      while (l >= 1 && hit == null) {
        val sub = word.substring(offs(pos), offs(pos + l))
        val cand = if (pos == 0) sub else "##" + sub
        if (vocab.contains(cand)) { hit = cand; hitLen = l }
        l -= 1
      }
      if (hit == null) return Array(UnkPiece)
      out += hit
      pos += hitLen
    }
    out.toArray
  }

  /** Catalyst-facing wrapper: UTF8String in, ArrayData[UTF8String] out. */
  def segmentUtf8(word: UTF8String, vocab: java.util.HashSet[String],
      maxContentLen: Int): ArrayData = {
    val pieces = segment(word.toString, vocab, maxContentLen)
    val arr = new Array[Any](pieces.length)
    var i = 0
    while (i < pieces.length) {
      arr(i) = UTF8String.fromString(pieces(i)); i += 1
    }
    new GenericArrayData(arr)
  }
}
