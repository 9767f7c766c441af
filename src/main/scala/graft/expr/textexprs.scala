package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis and fingerprinting expressions for training-data pipelines.
  *
  * All hashing is pure-Scala, allocation-light, and deterministic (no RNG at
  * eval time), so results are reproducible across partitionings and runs —
  * a requirement for dedup at 100 TB where candidate generation must be a
  * pure function of the row. Token hashing works on the UTF8String bytes
  * without materializing substrings.
  */
object TextHash {
  /** 64-bit FNV-1a over a byte range, finished with a splitmix64 avalanche.
    * Good dispersion for shingle/minhash use; stable across JVMs. */
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  @inline def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    h
  }

  @inline def hashBytes(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = FnvOffset ^ avalanche(seed)
    var i = from
    while (i < until) { h ^= bytes(i) & 0xffL; h *= FnvPrime; i += 1 }
    avalanche(h)
  }

  /** Combine a rolling window of token hashes into one shingle hash. */
  @inline def combine(acc: Long, tokenHash: Long): Long =
    avalanche(acc * 0x9e3779b97f4a7c15L + tokenHash)

  /** Hash every whitespace-separated token of a UTF8String. Returns the
    * number of tokens; hashes are written into `out` if non-null (caller
    * sizes it; overflow tokens are counted but not stored). */
  def tokenHashes(s: UTF8String, out: Array[Long], seed: Long): Int = {
    val b = s.getBytes
    var n = 0
    var i = 0
    val len = b.length
    while (i < len) {
      while (i < len && isSpace(b(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(b(i))) i += 1
        if (out != null && n < out.length) out(n) = hashBytes(b, start, i, seed)
        n += 1
      }
    }
    n
  }

  @inline def isSpace(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || 0x0b == c
}

/** Per-row kernels behind the text expressions, as plain static methods so
  * generated code calls them directly — the expressions stay inside
  * whole-stage codegen (a CodegenFallback would bridge through interpreted
  * eval with per-row InternalRow construction). */
object TextKernels {
  def minhash(t: UTF8String, n: Int, k: Int, seed: Long): GenericArrayData = {
    require(n >= 1, "shingle_n must be >= 1")
    require(k >= 1 && k <= 1024, "num_hashes must be in [1, 1024]")
    val nTok = TextHash.tokenHashes(t, null, seed)
    val toks = new Array[Long](nTok)
    TextHash.tokenHashes(t, toks, seed)
    val sig = Array.fill(k)(Long.MaxValue)
    if (nTok >= n) {
      var i = 0
      while (i + n <= nTok) {
        var h = 0x27d4eb2f165667c5L
        var j = 0
        while (j < n) { h = TextHash.combine(h, toks(i + j)); j += 1 }
        val h2 = TextHash.avalanche(h) | 1L
        var f = 0
        var hi = h
        while (f < k) {
          if (hi < sig(f)) sig(f) = hi
          hi += h2
          f += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  def simhash(t: UTF8String, n: Int): Long = {
    require(n >= 1, "shingle_n must be >= 1")
    val nTok = TextHash.tokenHashes(t, null, 0L)
    val toks = new Array[Long](nTok)
    TextHash.tokenHashes(t, toks, 0L)
    val votes = new Array[Int](64)
    var i = 0
    while (i + n <= nTok) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < n) { h = TextHash.combine(h, toks(i + j)); j += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private def shingleSet(s: UTF8String, n: Int): java.util.HashSet[java.lang.Long] = {
    val nTok = TextHash.tokenHashes(s, null, 0L)
    val toks = new Array[Long](nTok)
    TextHash.tokenHashes(s, toks, 0L)
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + n <= nTok) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < n) { h = TextHash.combine(h, toks(i + j)); j += 1 }
      set.add(h)
      i += 1
    }
    set
  }

  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    require(n >= 1, "shingle_n must be >= 1")
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      var inter = 0
      val it = sa.iterator()
      while (it.hasNext) if (sb.contains(it.next())) inter += 1
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  def docFingerprint(t: UTF8String, k: Int): Long = {
    require(k >= 1, "window must be >= 1")
    val b = t.getBytes
    if (b.length < k) TextHash.hashBytes(b, 0, b.length, 0L)
    else {
      // polynomial rolling hash with precomputed base^(k-1) for O(1) slide
      val base = 0x100000001b3L
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow *= base; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * base + (b(i) & 0xffL); i += 1 }
      var min = TextHash.avalanche(h)
      while (i < b.length) {
        h = (h - (b(i - k) & 0xffL) * pow) * base + (b(i) & 0xffL)
        val a = TextHash.avalanche(h)
        if (a < min) min = a
        i += 1
      }
      min
    }
  }

  /** UTF-8 code-point count of a byte range (continuation bytes excluded). */
  @inline private def charCount(b: Array[Byte], from: Int, until: Int): Int = {
    var n = 0
    var i = from
    while (i < until) { if ((b(i) & 0xc0) != 0x80) n += 1; i += 1 }
    n
  }

  /** Repetition signals for corpus quality filtering (Gopher-style):
    * line-level duplication plus n-gram repetition mass. One pass over the
    * document; duplicate detection via 64-bit content hashes (collision
    * probability negligible against the fractions' 1e-6 gate rounding).
    *
    * Definitions (fractions in [0,1], 0.0 on empty denominators):
    *  - lines = text split on '\n' (empty segments kept, like SQL
    *    string_split), so n_lines = newline count + 1;
    *  - dup_line_fraction      = (n_lines − distinct lines) / n_lines
    *  - dup_line_char_fraction = chars in repeat line occurrences beyond the
    *    first / total line chars
    *  - token n-grams: whitespace tokens, gram char length = token chars
    *    joined by single spaces;
    *  - top_ngram_char_fraction = max over grams of count·len(gram) / chars(text)
    *  - dup_ngram_char_fraction = Σ over grams with count ≥ 2 of
    *    count·len(gram) / chars(text)   (multiset definition: overlapping
    *    occurrences all count, unlike Gopher's distinct-char variant)
    */
  def repStats(t: UTF8String, n: Int): GenericInternalRow = {
    require(n >= 1, "ngram_n must be >= 1")
    val b = t.getBytes
    val len = b.length

    // ---- line signals ----
    val lineMap = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var nLines = 0
    var totalLineChars = 0L
    var segStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == '\n') {
        val chars = charCount(b, segStart, i)
        val h = java.lang.Long.valueOf(TextHash.hashBytes(b, segStart, i, 0L))
        val e = lineMap.get(h)
        if (e == null) lineMap.put(h, Array(1L, chars.toLong))
        else e(0) += 1
        nLines += 1
        totalLineChars += chars
        segStart = i + 1
      }
      i += 1
    }
    var dupLineChars = 0L
    val lit = lineMap.values.iterator()
    while (lit.hasNext) { val e = lit.next(); dupLineChars += (e(0) - 1) * e(1) }
    val distinctLines = lineMap.size

    // ---- n-gram signals ----
    val nTok = TextHash.tokenHashes(t, null, 0L)
    val tokHash = new Array[Long](nTok)
    val tokChars = new Array[Int](nTok)
    var ti = 0
    i = 0
    while (i < len) {
      while (i < len && TextHash.isSpace(b(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !TextHash.isSpace(b(i))) i += 1
        tokHash(ti) = TextHash.hashBytes(b, start, i, 0L)
        tokChars(ti) = charCount(b, start, i)
        ti += 1
      }
    }
    val totalChars = charCount(b, 0, len)
    val gramMap = new java.util.HashMap[java.lang.Long, Array[Long]]()
    i = 0
    while (i + n <= nTok) {
      var h = 0x27d4eb2f165667c5L
      var chars = (n - 1).toLong
      var j = 0
      while (j < n) { h = TextHash.combine(h, tokHash(i + j)); chars += tokChars(i + j); j += 1 }
      val key = java.lang.Long.valueOf(h)
      val e = gramMap.get(key)
      if (e == null) gramMap.put(key, Array(1L, chars))
      else e(0) += 1
      i += 1
    }
    var topMass = 0L
    var dupMass = 0L
    val git = gramMap.values.iterator()
    while (git.hasNext) {
      val e = git.next()
      val mass = e(0) * e(1)
      if (mass > topMass) topMass = mass
      if (e(0) >= 2) dupMass += mass
    }

    val row = new GenericInternalRow(5)
    row.setInt(0, nLines)
    row.setDouble(1, if (nLines == 0) 0.0 else (nLines - distinctLines).toDouble / nLines)
    row.setDouble(2, if (totalLineChars == 0L) 0.0 else dupLineChars.toDouble / totalLineChars)
    row.setDouble(3, if (totalChars == 0) 0.0 else topMass.toDouble / totalChars)
    row.setDouble(4, if (totalChars == 0) 0.0 else dupMass.toDouble / totalChars)
    row
  }

  /** Distinct n-token-window rolling hashes, sorted ascending — the span
    * key set for exact-substring dedup. Same gram-hash chain as
    * minhash/simhash, so a shared span hash ⇔ a shared n-token run (64-bit,
    * collisions negligible). */
  def shingleHashes(t: UTF8String, n: Int): GenericArrayData = {
    require(n >= 1, "window must be >= 1")
    val nTok = TextHash.tokenHashes(t, null, 0L)
    val toks = new Array[Long](nTok)
    TextHash.tokenHashes(t, toks, 0L)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= nTok) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < n) { h = TextHash.combine(h, toks(i + j)); j += 1 }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Content-defined chunk hashes (byte-level Rabin-style CDC): a chunk
    * boundary falls AFTER byte i whenever the avalanched 16-byte polynomial
    * window hash ending at i has its low `bits` bits zero; each chunk is
    * FNV-1a(+avalanche)-hashed. Boundaries depend only on the local 16
    * bytes, so an edit re-synchronizes within one window and every
    * untouched chunk keeps its hash — the dedup signal for content WITHOUT
    * token structure (code, CJK, whitespace-free streams), where token
    * spans cannot exist. Texts shorter than the window yield one
    * whole-text chunk; empty text yields no chunks. Expected chunk length
    * ≈ 2^bits bytes. */
  def cdcChunkHashes(t: UTF8String, bits: Int): GenericArrayData = {
    require(bits >= 1 && bits <= 32, "bits must be in [1, 32]")
    val b = t.getBytes
    val k = 16
    if (b.length == 0) return new GenericArrayData(Array.emptyLongArray)
    if (b.length < k)
      return new GenericArrayData(Array(TextHash.hashBytes(b, 0, b.length, 0L)))
    val mask = (1L << bits) - 1
    val base = TextHash.FnvPrime
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + (b(i) & 0xffL); i += 1 }
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var start = 0
    if ((TextHash.avalanche(h) & mask) == 0L) {
      out += TextHash.hashBytes(b, 0, i, 0L); start = i
    }
    while (i < b.length) {
      h = (h - (b(i - k) & 0xffL) * pow) * base + (b(i) & 0xffL)
      i += 1
      if ((TextHash.avalanche(h) & mask) == 0L) {
        out += TextHash.hashBytes(b, start, i, 0L)
        start = i
      }
    }
    if (start < b.length) out += TextHash.hashBytes(b, start, b.length, 0L)
    new GenericArrayData(out.result())
  }

  /** Positional n-token-window hashes in WINDOW ORDER (not distinct, not
    * sorted): element i = hash of tokens [i, i+n) — the positional span
    * stream maximal-run chaining needs ([[graft.ops.Dedup.sharedRuns]]).
    * Same tokenization + gram-hash chain as [[shingleHashes]]. */
  def shingleHashesPos(t: UTF8String, n: Int): GenericArrayData = {
    require(n >= 1, "window must be >= 1")
    val nTok = TextHash.tokenHashes(t, null, 0L)
    val toks = new Array[Long](nTok)
    TextHash.tokenHashes(t, toks, 0L)
    val out = new Array[Long](math.max(nTok - n + 1, 0))
    var i = 0
    while (i + n <= nTok) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < n) { h = TextHash.combine(h, toks(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken 2003, the
    * MOSS algorithm): hash every k-byte window with the same rolling
    * polynomial as [[docFingerprint]], then from each run of `w`
    * consecutive window hashes select the MINIMUM, ties to the RIGHTMOST —
    * the guarantee is that any shared substring of length ≥ k + w − 1
    * yields at least one shared selected fingerprint, while only ~1/w of
    * positions are kept. Selected positions are non-decreasing as the
    * window slides, so recording position changes yields the distinct
    * (pos, hash) set. O(n) via a monotone deque (pushing j evicts every
    * back entry with hash ≥ h[j], so the newest of tied minima survives —
    * the winnowing tie rule). Texts with fewer than k bytes yield no
    * fingerprints; fewer than w window hashes winnow as one window.
    * Comparisons are on SIGNED avalanched hashes (mirrors the SQL replay). */
  def winnow(t: UTF8String, k: Int, w: Int): GenericArrayData = {
    require(k >= 1, "k must be >= 1")
    require(w >= 1, "window must be >= 1")
    val b = t.getBytes
    val m = b.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    val base = TextHash.FnvPrime
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + (b(i) & 0xffL); i += 1 }
    hs(0) = TextHash.avalanche(h)
    while (i < b.length) {
      h = (h - (b(i - k) & 0xffL) * pow) * base + (b(i) & 0xffL)
      hs(i - k + 1) = TextHash.avalanche(h)
      i += 1
    }
    val win = math.min(w, m)
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    val out = scala.collection.mutable.ArrayBuilder.make[Any]
    var last = -1
    var j = 0
    while (j < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (j >= win - 1) {
        while (dq(head) < j - win + 1) head += 1
        val sel = dq(head)
        if (sel != last) {
          val r = new GenericInternalRow(2)
          r.setInt(0, sel)
          r.setLong(1, hs(sel))
          out += r
          last = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.result())
  }

  /** Character n-gram window hashes in position order (duplicates kept) —
    * the chrF gram stream. Codepoint-aware: each window spans n UTF-8
    * codepoints and its BYTES hash through the same FNV-1a + avalanche
    * chain as `hash64`, so a SQL replay hashing the equivalent substring
    * computes the identical value. O(len·n) bytes hashed (n ≤ 8 — no
    * rolling needed). Fewer than n codepoints → empty. */
  def charGramHashes(t: UTF8String, n: Int): GenericArrayData = {
    require(n >= 1 && n <= 64, "n must be in [1, 64]")
    val b = t.getBytes
    val starts = new Array[Int](b.length + 1)
    var nc = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xc0) != 0x80) { starts(nc) = i; nc += 1 }
      i += 1
    }
    starts(nc) = b.length
    if (nc < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nc - n + 1)
    i = 0
    while (i + n <= nc) {
      out(i) = TextHash.hashBytes(b, starts(i), starts(i + n), 0L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-pair clipped n-gram overlap counts for orders 1..maxN — the BLEU
    * (token grams) / chrF (char grams via `chars = true`) inner loop,
    * evaluated entirely scan-side: element n−1 is
    * (clip, denc, denr) = (Σ_g min(c_cand, c_ref), |cand grams|,
    * |ref grams|) for order n. Clipping is per-pair in both metrics, so
    * corpus scores need only SUMS of these triples — no gram ever
    * shuffles. Multiset intersection by sort + two-pointer merge over
    * 64-bit gram hashes (collision odds ~2^-64); O(L·maxN·log L) per
    * pair. */
  def gramOverlapCounts(ref: UTF8String, cand: UTF8String, maxN: Int,
      chars: Boolean): GenericArrayData = {
    require(maxN >= 1 && maxN <= 8, "maxN must be in [1, 8]")
    def grams(t: UTF8String, n: Int): Array[Long] =
      if (chars) {
        val a = charGramHashes(t, n)
        val out = new Array[Long](a.numElements())
        var i = 0
        while (i < out.length) { out(i) = a.getLong(i); i += 1 }
        out
      } else {
        val nt = TextHash.tokenHashes(t, null, 0L)
        val ht = new Array[Long](nt)
        TextHash.tokenHashes(t, ht, 0L)
        val m = math.max(nt - n + 1, 0)
        val out = new Array[Long](m)
        var i = 0
        while (i < m) {
          var h = 0x27d4eb2f165667c5L
          var j = 0
          while (j < n) { h = TextHash.combine(h, ht(i + j)); j += 1 }
          out(i) = h
          i += 1
        }
        out
      }
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val gc = grams(cand, n)
      val gr = grams(ref, n)
      java.util.Arrays.sort(gc)
      java.util.Arrays.sort(gr)
      var i = 0
      var j = 0
      var clip = 0L
      while (i < gc.length && j < gr.length) {
        if (gc(i) == gr(j)) { clip += 1; i += 1; j += 1 }
        else if (gc(i) < gr(j)) i += 1
        else j += 1
      }
      val r = new GenericInternalRow(3)
      r.setLong(0, clip)
      r.setLong(1, gc.length)
      r.setLong(2, gr.length)
      out(n - 1) = r
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Token-level longest-common-subsequence LENGTH — the ROUGE-L core.
    * Tokens compare by their 64-bit FNV hash (same whitespace
    * tokenization as [[tokenHashes]]; a collision shortening/lengthening
    * the LCS needs two distinct tokens at ~2^-64 — far below every
    * gate's rounding grain). Classic O(n·m) two-row DP, rows over the
    * SHORTER side so memory is O(min(n, m)); LCS is symmetric, so the
    * swap is free. Empty/blank inputs give 0. */
  def tokenLcs(a: UTF8String, b: UTF8String): Int = {
    val na = TextHash.tokenHashes(a, null, 0L)
    val nb = TextHash.tokenHashes(b, null, 0L)
    if (na == 0 || nb == 0) return 0
    val ha = new Array[Long](na)
    TextHash.tokenHashes(a, ha, 0L)
    val hb = new Array[Long](nb)
    TextHash.tokenHashes(b, hb, 0L)
    val (x, y) = if (nb <= na) (ha, hb) else (hb, ha)
    val m = y.length
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 0
    while (i < x.length) {
      var j = 0
      while (j < m) {
        cur(j + 1) =
          if (x(i) == y(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  def langId(input: UTF8String): UTF8String = {
    val s = input.toString
    if (s.isEmpty) return UTF8String.fromString("und")
    var cjk = 0; var total = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!Character.isWhitespace(cp)) {
        total += 1
        if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf)) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (total > 0 && cjk.toDouble / total > 0.2) return UTF8String.fromString("zh")
    val toks = s.toLowerCase.split("\\s+")
    var best = "und"; var bestHits = 0
    LangProfiles.sortedProfiles.foreach { case (lang, words) =>
      val hits = toks.count(words.contains)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    UTF8String.fromString(best)
  }

  def textStats(input: UTF8String): GenericInternalRow = {
    val s = input.toString
    val n = s.length
    var alpha = 0; var digit = 0; var punct = 0; var space = 0; var upper = 0
    var tokens = 0; var inTok = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { space += 1; inTok = false }
      else {
        if (!inTok) { tokens += 1; inTok = true }
        if (Character.isLetter(c)) { alpha += 1; if (Character.isUpperCase(c)) upper += 1 }
        else if (Character.isDigit(c)) digit += 1
        else punct += 1
      }
      i += 1
    }
    val d = if (n == 0) 1.0 else n.toDouble
    val row = new GenericInternalRow(8)
    row.setInt(0, n)
    row.setInt(1, tokens)
    row.setDouble(2, if (tokens == 0) 0.0 else (n - space).toDouble / tokens)
    row.setDouble(3, alpha / d)
    row.setDouble(4, digit / d)
    row.setDouble(5, punct / d)
    row.setDouble(6, space / d)
    row.setDouble(7, upper / d)
    row
  }

  /** Shannon entropy of the UTF-8 BYTE distribution, in bits per byte —
    * the cheap garbage/binary/compression-proxy quality signal (near 0:
    * degenerate repetition; ~4.1: English text; ~6+: base64/binary soup).
    * Byte-level (not codepoint) so the kernel never decodes; on ASCII text
    * byte == char distribution. H = log2(n) − (Σ cnt·log2(cnt))/n, summed
    * in byte-value order (deterministic). Empty text → 0.0. */
  def charEntropy(input: UTF8String): Double = {
    val n = input.numBytes()
    if (n == 0) return 0.0
    val cnt = new Array[Int](256)
    var i = 0
    while (i < n) { cnt(input.getByte(i) & 0xff) += 1; i += 1 }
    var s = 0.0
    var b = 0
    while (b < 256) {
      val c = cnt(b)
      if (c > 0) s += c * (math.log(c) / math.log(2.0))
      b += 1
    }
    math.log(n) / math.log(2.0) - s / n
  }

  /** Java-reachable name of this object for generated code. */
  val RefName: String =
    classOf[TextKernels.type].getName.stripSuffix("$") + "$.MODULE$"
}

/** hash64(x) → long: the engine's deterministic 64-bit row-key hash.
  * The deterministic-sampling primitive: reproducible across runs, JVMs and
  * partitionings (no RNG, no partition index), so sample membership is a
  * pure function of the row key — re-runs and retries see the same sample.
  *
  * Typed dispatch, never an implicit cast: integral keys go through the
  * splitmix64 finalizer on their 64-bit value; string/binary keys are
  * byte-hashed (FNV-1a + avalanche, same pipeline as token hashing), so
  * '1' and '01' hash differently and non-numeric strings can't blow up an
  * ANSI string→long cast at runtime. Other types are rejected at analysis
  * with an explicit error. Codegen'd inline either way. */
case class Hash64(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash64 requires an integral, string, or binary key, got " +
        s"${other.catalogString}; cast explicitly if a lossy key is intended")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash64"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      val b = input.asInstanceOf[UTF8String].getBytes
      TextHash.hashBytes(b, 0, b.length, 0L)
    case BinaryType =>
      val b = input.asInstanceOf[Array[Byte]]
      TextHash.hashBytes(b, 0, b.length, 0L)
    case _ => TextHash.avalanche(input.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val th = classOf[TextHash.type].getName.stripSuffix("$") + "$.MODULE$"
      child.dataType match {
        case StringType =>
          val b = ctx.freshName("b")
          s"""
             |byte[] $b = $c.getBytes();
             |${ev.value} = $th.hashBytes($b, 0, $b.length, 0L);
           """.stripMargin
        case BinaryType =>
          s"${ev.value} = $th.hashBytes($c, 0, $c.length, 0L);"
        case _ =>
          val h = ctx.freshName("h")
          s"""
             |long $h = (long) $c;
             |$h ^= $h >>> 30; $h *= 0xbf58476d1ce4e5b9L;
             |$h ^= $h >>> 27; $h *= 0x94d049bb133111ebL;
             |${ev.value} = $h ^ ($h >>> 31);
           """.stripMargin
      }
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** token_count(text) → int: number of whitespace-separated tokens. */
case class TokenCount(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenHashes(input.asInstanceOf[UTF8String], null, 0L)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val th = classOf[TextHash.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $th.tokenHashes($c, (long[]) null, 0L);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** minhash_signature(text, shingle_n, num_hashes, seed) → array<long>.
  *
  * Word-shingle MinHash: k-token shingles hashed once, then expanded into
  * `num_hashes` independent hash functions via Kirsch–Mitzenmacher double
  * hashing h_i(x) = h1(x) + i·h2(x). Signature[i] = min over shingles.
  * Mergeable (elementwise min) and pure — the distributed dedup primitive.
  */
case class MinHashSignature(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType, IntegerType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any, nAny: Any, kAny: Any, seedAny: Any): Any =
    TextKernels.minhash(t.asInstanceOf[UTF8String], nAny.asInstanceOf[Int],
      kAny.asInstanceOf[Int], seedAny.asInstanceOf[Long])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, k, seed) =>
      s"${ev.value} = ${TextKernels.RefName}.minhash($t, $n, $k, $seed);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(a, b, c, d)
}

/** simhash64(text, shingle_n) → long: 64-bit SimHash over token shingles.
  * Near-duplicate docs differ in few bits (hamming distance via
  * bit_count(a ^ b), a stock Spark function). */
case class SimHash64(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(t: Any, nAny: Any): Any =
    TextKernels.simhash(t.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = ${TextKernels.RefName}.simhash($t, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ngram_jaccard(a, b, n) → double: exact Jaccard similarity of the two
  * documents' n-token-shingle sets (the verification step after LSH
  * candidate generation). */
case class NgramJaccard(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  override protected def nullSafeEval(a: Any, b: Any, nAny: Any): Any =
    TextKernels.ngramJaccard(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) =>
      s"${ev.value} = ${TextKernels.RefName}.ngramJaccard($a, $b, $n);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** shingle_hashes(text, n) → array<long>: the document's distinct n-token
  * contiguous-window hashes, ascending. Exploding this array is the
  * candidate-generation step of exact-span (substring) dedup: two documents
  * share a value iff they share an n-token run. */
case class ShingleHashes(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(t: Any, nAny: Any): Any =
    TextKernels.shingleHashes(t.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = ${TextKernels.RefName}.shingleHashes($t, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** shingle_hashes_pos(text, n) → array<long>: n-token window hashes in
  * POSITION order (duplicates kept) — posexplode yields (token position,
  * span hash), the input of maximal-run chaining. */
case class ShingleHashesPos(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_pos"

  override protected def nullSafeEval(t: Any, nAny: Any): Any =
    TextKernels.shingleHashesPos(t.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = ${TextKernels.RefName}.shingleHashesPos($t, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cdc_chunk_hashes(text, bits) → array<long>: content-defined chunk hashes
  * in stream order (duplicates kept) — the byte-level CDC dedup key set;
  * see [[TextKernels.cdcChunkHashes]]. */
case class CdcChunkHashes(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override protected def nullSafeEval(t: Any, bAny: Any): Any =
    TextKernels.cdcChunkHashes(t.asInstanceOf[UTF8String], bAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) =>
      s"${ev.value} = ${TextKernels.RefName}.cdcChunkHashes($t, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** doc_fingerprint(text, k) → long: minimum rolling (Rabin-style) hash over
  * all k-byte character windows — a 1-permutation MinHash of char k-grams.
  * Equal fingerprints ⇒ likely shared content run; cheap first-pass near-dup
  * key that is robust to token reordering at the edges. */
case class DocFingerprint(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override protected def nullSafeEval(t: Any, kAny: Any): Any =
    TextKernels.docFingerprint(t.asInstanceOf[UTF8String],
      kAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = ${TextKernels.RefName}.docFingerprint($t, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** gram_overlap_counts(ref, cand, maxN) / char_gram_overlap_counts(...) →
  * array<struct<clip,denc,denr>> — per-pair clipped n-gram overlap for
  * orders 1..maxN (see [[TextKernels.gramOverlapCounts]]): the BLEU/chrF
  * inner loop as ONE scan-side codegen'd expression, so corpus metrics
  * reduce to a group-keyed fold of 3·maxN sums with no gram shuffle. */
case class GramOverlapCounts(first: Expression, second: Expression,
    third: Expression, chars: Boolean)
  extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("clip", LongType, nullable = false),
    StructField("denc", LongType, nullable = false),
    StructField("denr", LongType, nullable = false))), containsNull = false)
  override def prettyName: String =
    if (chars) "char_gram_overlap_counts" else "gram_overlap_counts"

  override protected def nullSafeEval(r: Any, c: Any, nAny: Any): Any =
    TextKernels.gramOverlapCounts(r.asInstanceOf[UTF8String],
      c.asInstanceOf[UTF8String], nAny.asInstanceOf[Int], chars)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (r, c, n) =>
      s"${ev.value} = ${TextKernels.RefName}.gramOverlapCounts($r, $c, $n, $chars);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(a, b, c)
}

/** char_gram_hashes(text, n) → array<long>: character n-gram window hashes
  * in position order (see [[TextKernels.charGramHashes]]) — chrF's gram
  * stream as fixed-width keys instead of substring strings. */
case class CharGramHashes(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(t: Any, nAny: Any): Any =
    TextKernels.charGramHashes(t.asInstanceOf[UTF8String],
      nAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = ${TextKernels.RefName}.charGramHashes($t, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** token_lcs(a, b) → int: token-level longest-common-subsequence length
  * (see [[TextKernels.tokenLcs]]) — the ROUGE-L numerator, evaluated
  * scan-side inside whole-stage codegen. */
case class TokenLcs(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_lcs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.tokenLcs(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${TextKernels.RefName}.tokenLcs($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** winnow_fingerprints(text, k, w) → array<struct<pos:int, fp:long>>: the
  * document's winnowed k-gram fingerprints (MOSS selection; see
  * [[TextKernels.winnow]]) — exploding this array is the candidate
  * generation of substring-overlap detection at ~1/w the density of the
  * full shingle stream. */
case class WinnowFingerprints(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(t: Any, kAny: Any, wAny: Any): Any =
    TextKernels.winnow(t.asInstanceOf[UTF8String],
      kAny.asInstanceOf[Int], wAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = ${TextKernels.RefName}.winnow($t, $k, $w);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(a, b, c)
}

object LangProfiles {
  /** Tiny built-in stopword profiles; scored by token hits. Chinese is
    * detected via CJK code points before tokenization. */
  val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
      "on", "with", "as", "was", "are", "this", "be", "at", "by", "not"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "los", "del", "se", "las",
      "por", "un", "para", "con", "una", "su", "al", "es", "lo", "como"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "den", "im", "mit",
      "für", "auf", "des", "ein", "eine", "nicht", "auch", "sich", "es", "zu", "dem"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "un", "une", "du", "est",
      "en", "que", "qui", "dans", "pour", "pas", "sur", "au", "ne", "ce"))
  /** Deterministic iteration order for the argmax tie-break. */
  val sortedProfiles: Seq[(String, Set[String])] = profiles.toSeq.sortBy(_._1)
}

/** lang_id(text) → string: lightweight language identification.
  * CJK codepoint ratio → "zh"; otherwise argmax of per-language stopword hit
  * rate over {en, es, de, fr}; "und" (undetermined) when nothing matches. */
case class LangId(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${TextKernels.RefName}.langId($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("space_ratio", DoubleType, nullable = false),
    StructField("upper_ratio", DoubleType, nullable = false)))
}

object RepStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_fraction", DoubleType, nullable = false),
    StructField("dup_line_char_fraction", DoubleType, nullable = false),
    StructField("top_ngram_char_fraction", DoubleType, nullable = false),
    StructField("dup_ngram_char_fraction", DoubleType, nullable = false)))
}

/** rep_stats(text, ngram_n) → struct: repetition signals for corpus quality
  * filtering (Gopher-style duplicate-line and repeated-n-gram mass; see
  * [[TextKernels.repStats]] for exact definitions). One pass, codegen'd. */
case class RepStatsExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = RepStatsExpr.schema
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(t: Any, nAny: Any): Any =
    TextKernels.repStats(t.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = ${TextKernels.RefName}.repStats($t, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** text_stats(text) → struct: one-pass character/token statistics used for
  * quality filtering of web-scale corpora. Ratios are over total chars
  * (0.0 on empty text). */
case class TextStatsExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.textStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${TextKernels.RefName}.textStats($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** char_entropy(text) → double: Shannon entropy of the UTF-8 byte
  * distribution in bits/byte ([[TextKernels.charEntropy]]) — the
  * compression-proxy quality filter. One pass, codegen'd. */
case class CharEntropyExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${TextKernels.RefName}.charEntropy($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
