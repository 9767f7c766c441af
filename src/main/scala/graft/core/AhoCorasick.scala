package graft.core

/** Aho–Corasick multi-pattern string automaton (Aho & Corasick, CACM 1975 —
  * public literature; also the engine behind fgrep and every badword
  * filter). Finds ALL occurrences of ALL patterns in one pass over the
  * text: O(text + matches), independent of pattern count — the property
  * that makes a 10k-entry blocklist as cheap as a 10-entry one.
  *
  * The automaton is built once on the driver (patterns are vocabulary-
  * bounded data, same contract as the NB model and BPE vocab), then
  * broadcast; matching is allocation-free per position. Matching is
  * case-sensitive and counts every end position (overlapping occurrences
  * included — "a a" occurs twice in "a a a"), the standard AC semantics.
  *
  * Frozen representation is parallel arrays (sorted char keys + binary
  * search per node): compact, cache-friendly, Java-serializable for
  * broadcast.
  */
final class AhoCorasick private (
    val nPatterns: Int,
    // per-node sorted outgoing edge labels / targets (CSR layout)
    private val edgeOff: Array[Int],
    private val edgeChar: Array[Char],
    private val edgeTo: Array[Int],
    private val fail: Array[Int],
    // pattern ids ending exactly at this node (CSR layout)
    private val outOff: Array[Int],
    private val outIds: Array[Int],
    // nearest node on the fail chain (inclusive) with output, or -1
    private val dict: Array[Int]) extends Serializable {

  private def step(stateIn: Int, c: Char): Int = {
    var state = stateIn
    while (true) {
      val lo = edgeOff(state); val hi = edgeOff(state + 1)
      var a = lo; var b = hi - 1
      while (a <= b) {
        val m = (a + b) >>> 1
        val mc = edgeChar(m)
        if (mc == c) return edgeTo(m)
        else if (mc < c) a = m + 1 else b = m - 1
      }
      if (state == 0) return 0
      state = fail(state)
    }
    0 // unreachable
  }

  /** Total number of pattern occurrences in `text` (all patterns, all end
    * positions, overlaps included). */
  def countMatches(text: String): Long = {
    var total = 0L
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      var d = if (outOff(state + 1) > outOff(state)) state else dict(state)
      while (d >= 0) {
        total += outOff(d + 1) - outOff(d)
        d = dict(d)
      }
      i += 1
    }
    total
  }

  /** (total occurrences, number of distinct patterns present). */
  def matchStats(text: String): (Long, Int) = {
    var total = 0L
    val seen = new Array[Boolean](nPatterns)
    var distinct = 0
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      var d = if (outOff(state + 1) > outOff(state)) state else dict(state)
      while (d >= 0) {
        var j = outOff(d)
        while (j < outOff(d + 1)) {
          total += 1
          val id = outIds(j)
          if (!seen(id)) { seen(id) = true; distinct += 1 }
          j += 1
        }
        d = dict(d)
      }
      i += 1
    }
    (total, distinct)
  }

  /** True iff any pattern occurs in `text` — early-exits at the first hit,
    * so clean documents pay O(text) and blocked ones O(prefix). */
  def containsAny(text: String): Boolean = {
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      if (outOff(state + 1) > outOff(state) || dict(state) >= 0) return true
      i += 1
    }
    false
  }
}

object AhoCorasick {

  /** Build the automaton. Patterns must be non-empty; duplicates are kept
    * (each duplicate counts its own occurrences — callers wanting set
    * semantics `.distinct` first). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "pattern list must be non-empty")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "patterns must be non-empty strings")
    import scala.collection.mutable
    val goto = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        s = goto(s).getOrElse(c, {
          goto += mutable.TreeMap.empty[Char, Int]
          ends += mutable.ArrayBuffer.empty[Int]
          val t = goto.size - 1
          goto(s)(c) = t
          t
        })
        i += 1
      }
      ends(s) += id
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val dict = Array.fill(n)(-1)
    // BFS: fail(child) = step(fail(parent), c); dict = nearest output on
    // the fail chain.
    val queue = mutable.Queue.empty[Int]
    goto(0).foreach { case (_, t) => fail(t) = 0; queue += t }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dict(u) =
        if (ends(fail(u)).nonEmpty) fail(u)
        else dict(fail(u))
      goto(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        // any c-child of f sits strictly shallower than v, so this can
        // never resolve to v itself
        fail(v) = goto(f).getOrElse(c, 0)
        queue += v
      }
    }
    // freeze to CSR
    val edgeOff = new Array[Int](n + 1)
    var totalEdges = 0
    var i = 0
    while (i < n) { totalEdges += goto(i).size; edgeOff(i + 1) = totalEdges; i += 1 }
    val edgeChar = new Array[Char](totalEdges)
    val edgeTo = new Array[Int](totalEdges)
    i = 0
    var k = 0
    while (i < n) {
      goto(i).foreach { case (c, t) => edgeChar(k) = c; edgeTo(k) = t; k += 1 }
      i += 1
    }
    val outOff = new Array[Int](n + 1)
    var totalOut = 0
    i = 0
    while (i < n) { totalOut += ends(i).size; outOff(i + 1) = totalOut; i += 1 }
    val outIds = new Array[Int](totalOut)
    i = 0
    k = 0
    while (i < n) {
      ends(i).foreach { id => outIds(k) = id; k += 1 }
      i += 1
    }
    new AhoCorasick(patterns.size, edgeOff, edgeChar, edgeTo, fail,
      outOff, outIds, dict)
  }
}
