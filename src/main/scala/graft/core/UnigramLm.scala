package graft.core

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic unigram-LM tokenizer kernels (SentencePiece-style,
  * Kudo 2018 — the hard-EM / Viterbi-count variant; cf. the reference's
  * tokenizer-family coverage, which graft extends the same way it extends
  * BPE in [[graft.ops.Bpe]]).
  *
  * Determinism contract (what makes the DuckDB oracle replay exact):
  *  - piece scores are INTEGER-scaled log probabilities,
  *    `round(ln(count/total) · 10^6)` half-away-from-zero — the Viterbi DP
  *    then runs in exact integer arithmetic with zero float drift between
  *    the JVM and SQL replays (only the one `ln` per piece touches floats,
  *    and a 1-ulp libm difference moves the scaled score only within
  *    ~1e-10 of a rounding boundary);
  *  - every DP cell is canonical under the tie-break
  *    (max score, then fewest pieces, then smallest start-of-last-piece
  *    index), so both replays reconstruct the same segmentation;
  *  - positions are Unicode CODE POINTS (DuckDB slices strings by code
  *    point, JVM Strings by UTF-16 unit — surrogate pairs would desync
  *    the DP otherwise).
  */
object UnigramLm {
  /** Fixed-point scale for log-probability scores. */
  val ScoreScale: Double = 1e6

  /** Fallback score for a single character absent from the piece table —
    * large enough below any real ln(p)·10^6 (p ≥ 1e-40) that a known
    * segmentation always wins, but total (segmentation never fails). */
  val UnkScore: Long = -100000000L

  /** `round(ln(cnt/total) · 10^6)` rounded half-away-from-zero — exactly
    * DuckDB's `round(ln(cnt::DOUBLE / total) * 1000000)::BIGINT`. */
  def scaledLogProb(cnt: Long, total: Long): Long =
    new java.math.BigDecimal(
      math.log(cnt.toDouble / total.toDouble) * ScoreScale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Viterbi segmentation of `word` under integer piece scores: maximizes
    * the score sum over pieces of length ≤ maxPieceLen; unknown single
    * chars fall back to [[UnkScore]] so the DP is total. Returns pieces in
    * order. Runs over word TYPES (vocabulary-sized tables), never the
    * corpus. */
  def segment(word: String, table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    // code-point alignment (see determinism contract)
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty
    // prefix char offsets so piece extraction is one substring each
    val offs = new Array[Int](n + 1)
    var o = 0
    var ci = 0
    while (ci < n) {
      offs(ci) = o; o += Character.charCount(cps(ci)); ci += 1
    }
    offs(n) = o
    val best = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val bj = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var cs = Long.MinValue
      var cn = Int.MaxValue
      var cj = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(offs(j), offs(i))
        // boxed lookup: a missing key must stay null, never unbox to 0
        // (0 would outscore every real log prob and hijack the DP)
        val lp: java.lang.Long = table.get(piece)
        val score: java.lang.Long =
          if (lp != null) lp
          else if (i - j == 1) java.lang.Long.valueOf(UnkScore)
          else null
        if (score != null) {
          val sc = best(j) + score.longValue()
          val nn = np(j) + 1
          // (score desc, np asc, j asc): ascending j + strict improvement
          // keeps the smallest j among ties — the SQL row_number order
          if (sc > cs || (sc == cs && nn < cn)) { cs = sc; cn = nn; cj = j }
        }
        j += 1
      }
      best(i) = cs; np(i) = cn; bj(i) = cj
      i += 1
    }
    val out = new Array[String](np(n))
    var p = n
    var k = np(n) - 1
    while (p > 0) {
      val j = bj(p)
      out(k) = word.substring(offs(j), offs(p))
      k -= 1
      p = j
    }
    out
  }

  /** Catalyst-facing wrapper: UTF8String in, ArrayData[UTF8String] out. */
  def segmentUtf8(word: UTF8String,
      table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): ArrayData = {
    val pieces = segment(word.toString, table, maxPieceLen)
    val arr = new Array[Any](pieces.length)
    var i = 0
    while (i < pieces.length) {
      arr(i) = UTF8String.fromString(pieces(i)); i += 1
    }
    new GenericArrayData(arr)
  }
}
