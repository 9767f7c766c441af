package graft.core

/** Exact, order-independent ("reproducible") sum of IEEE-754 doubles.
  *
  * A Kulisch-style fixed-point superaccumulator: every finite double is an
  * integer multiple of 2^-1074, so x·2^1074 is an integer of at most 2098
  * bits. Positive and negative magnitudes accumulate into two little-endian
  * base-2^32 limb arrays with pure integer arithmetic — nothing rounds until
  * [[result]], which rounds the exact difference P − N once to the nearest
  * double (ties to even). The result is therefore a function of the input
  * MULTISET alone: any addition order, any partitioning, any merge tree
  * yields the same bits. That lets a distributed groupBy-sum replace an
  * ordered sequential fold wherever bit-reproducibility matters (e.g.
  * kmeansFit centroid updates), with map-side partial aggregation instead of
  * a sort-shuffle.
  *
  * Specials follow IEEE sum semantics: any NaN → NaN; +∞ and −∞ together →
  * NaN; otherwise an infinity wins. An exact-zero total returns +0.0.
  *
  * Cost: a handful of integer ops per add; the buffer is 2×70 longs
  * (~1.1 KB, serialized trimmed to the touched limb window) and merges
  * limb-wise — O(groups) state, row-count independent, the same contract as
  * every other graft sketch (SURVEY.md §7.4 item 9).
  */
final class ExactSum extends Serializable {
  import ExactSum._

  private[core] val pos = new Array[Long](NLimbs)
  private[core] val neg = new Array[Long](NLimbs)
  private[graft] var nan = 0L
  private[graft] var pInf = 0L
  private[graft] var nInf = 0L
  /** Non-null inputs folded in (incl. zeros/specials) — 0 ⇒ SQL null. */
  private[graft] var seen = 0L
  private var ops = 0

  def add(x: Double): Unit = {
    seen += 1
    if (java.lang.Double.isNaN(x)) { nan += 1; return }
    if (java.lang.Double.isInfinite(x)) {
      if (x > 0) pInf += 1 else nInf += 1
      return
    }
    if (x == 0.0) return
    val bits = java.lang.Double.doubleToRawLongBits(x)
    val expField = ((bits >>> 52) & 0x7ffL).toInt
    var m = bits & MantMask
    var s = 0
    // normal: x = (2^52 | frac) · 2^(E-1075) ⇒ scaled shift E-1; subnormal:
    // x = frac · 2^-1074 ⇒ shift 0
    if (expField != 0) { m |= ImplicitBit; s = expField - 1 }
    val li = s >>> 5
    val sh = s & 31
    val lo = m << sh
    val hi = if (sh == 0) 0L else m >>> (64 - sh)
    val t = if (bits < 0) neg else pos
    t(li) += lo & DigitMask
    t(li + 1) += lo >>> 32
    t(li + 2) += hi
    bumpOps()
  }

  /** Fold `o` in (o is normalized, not mutated otherwise). */
  def merge(o: ExactSum): Unit = {
    o.normalize()
    var i = 0
    while (i < NLimbs) {
      pos(i) += o.pos(i)
      neg(i) += o.neg(i)
      i += 1
    }
    nan += o.nan; pInf += o.pInf; nInf += o.nInf; seen += o.seen
    bumpOps()
  }

  // every add/merge deposits < 2^32 per limb; normalized limbs are < 2^32,
  // so 2^30 ops keep limbs < 2^62 + 2^32 — no signed-64 overflow
  private def bumpOps(): Unit = {
    ops += 1
    if (ops >= NormalizeEvery) normalize()
  }

  private[core] def normalize(): Unit = {
    carryPass(pos)
    carryPass(neg)
    ops = 0
  }

  private def carryPass(t: Array[Long]): Unit = {
    var c = 0L
    var i = 0
    while (i < NLimbs) {
      val v = t(i) + c
      t(i) = v & DigitMask
      c = v >>> 32
      i += 1
    }
    // c is always 0: NLimbs covers max |double|·2^1074 times 2^63 addends
  }

  /** The exact total rounded once to the nearest double (ties to even). */
  def result(): Double = {
    if (nan > 0 || (pInf > 0 && nInf > 0)) return Double.NaN
    if (pInf > 0) return Double.PositiveInfinity
    if (nInf > 0) return Double.NegativeInfinity
    normalize()
    val cmp = compareLimbs(pos, neg)
    if (cmp == 0) return 0.0
    val (big, small) = if (cmp > 0) (pos, neg) else (neg, pos)
    val d = new Array[Long](NLimbs)
    var borrow = 0L
    var i = 0
    while (i < NLimbs) {
      var v = big(i) - small(i) - borrow
      if (v < 0) { v += Base; borrow = 1L } else borrow = 0L
      d(i) = v
      i += 1
    }
    val mag = roundMagnitude(d)
    if (cmp > 0) mag else -mag
  }

  /** Round the nonzero magnitude `d` (value = Σ d(i)·2^(32i) · 2^-1074) to
    * the nearest double. Whenever actual rounding happens the top bit is at
    * position ≥ 53, i.e. the value is ≥ 2^-1021 — inside the NORMAL range —
    * so truncate-to-53-bits + RNE never double-rounds through a subnormal. */
  private def roundMagnitude(d: Array[Long]): Double = {
    var ti = NLimbs - 1
    while (d(ti) == 0L) ti -= 1
    val b = (ti << 5) + (63 - java.lang.Long.numberOfLeadingZeros(d(ti)))
    if (b <= 52) {
      // ≤ 53 significant bits: exact (value lives in limbs 0..1)
      val v = d(0) | (d(1) << 32)
      return Math.scalb(v.toDouble, -1074)
    }
    var mant = bitsAt(d, b - 52, 53)
    val roundBit = bitAt(d, b - 53)
    if (roundBit == 1L && (anyBitsBelow(d, b - 53) || (mant & 1L) == 1L))
      mant += 1 // may reach 2^53 — still exact as a double
    Math.scalb(mant.toDouble, b - 52 - 1074)
  }

  private def bitAt(d: Array[Long], p: Int): Long =
    if (p < 0) 0L else (d(p >>> 5) >>> (p & 31)) & 1L

  private def bitsAt(d: Array[Long], lowBit: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      v |= bitAt(d, lowBit + i) << i
      i += 1
    }
    v
  }

  private def anyBitsBelow(d: Array[Long], p: Int): Boolean = {
    if (p <= 0) return false
    val li = p >>> 5
    val sh = p & 31
    var i = 0
    while (i < li) {
      if (d(i) != 0L) return true
      i += 1
    }
    (d(li) & ((1L << sh) - 1)) != 0L
  }

  private def compareLimbs(a: Array[Long], b: Array[Long]): Int = {
    var i = NLimbs - 1
    while (i >= 0) {
      if (a(i) != b(i)) return if (a(i) > b(i)) 1 else -1
      i -= 1
    }
    0
  }

  /** Compact framed encoding: specials + trimmed limb windows (normalized,
    * so every limb fits 4 bytes). */
  def serialize(): Array[Byte] = {
    normalize()
    def window(t: Array[Long]): (Int, Int) = {
      var lo = 0
      while (lo < NLimbs && t(lo) == 0L) lo += 1
      if (lo == NLimbs) (0, 0)
      else {
        var hi = NLimbs - 1
        while (t(hi) == 0L) hi -= 1
        (lo, hi - lo + 1)
      }
    }
    val (pLo, pN) = window(pos)
    val (nLo, nN) = window(neg)
    val buf = java.nio.ByteBuffer.allocate(1 + 8 * 4 + 2 * 4 + 4 * (pN + nN))
    buf.put(1.toByte)
    buf.putLong(seen); buf.putLong(nan); buf.putLong(pInf); buf.putLong(nInf)
    buf.putShort(pLo.toShort); buf.putShort(pN.toShort)
    buf.putShort(nLo.toShort); buf.putShort(nN.toShort)
    var i = 0
    while (i < pN) { buf.putInt(pos(pLo + i).toInt); i += 1 }
    i = 0
    while (i < nN) { buf.putInt(neg(nLo + i).toInt); i += 1 }
    buf.array()
  }
}

object ExactSum {
  /** One scaled double < 2^2098; ≤ 2^63−1 addends keep the magnitude
    * < 2^2161 < 2^(32·68) — 68 limbs suffice, 70 leaves slack. */
  private[core] val NLimbs = 70
  private val Base = 1L << 32
  private val DigitMask = 0xffffffffL
  private val MantMask = 0xfffffffffffffL
  private val ImplicitBit = 1L << 52
  private val NormalizeEvery = 1 << 30

  def deserialize(bytes: Array[Byte]): ExactSum = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == 1, s"unknown ExactSum version $ver")
    val s = new ExactSum
    s.seen = buf.getLong(); s.nan = buf.getLong()
    s.pInf = buf.getLong(); s.nInf = buf.getLong()
    val pLo = buf.getShort().toInt; val pN = buf.getShort().toInt
    val nLo = buf.getShort().toInt; val nN = buf.getShort().toInt
    var i = 0
    while (i < pN) { s.pos(pLo + i) = buf.getInt().toLong & DigitMask; i += 1 }
    i = 0
    while (i < nN) { s.neg(nLo + i) = buf.getInt().toLong & DigitMask; i += 1 }
    s
  }
}
