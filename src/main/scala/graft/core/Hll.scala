package graft.core

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, 64-bit-hash
  * variant) — the industry-standard cardinality estimator: m = 2^p byte
  * registers, standard error ≈ 1.04/√m, merge = per-register max (a
  * commutative idempotent monoid, so distributed aggregation is exact
  * with respect to the sketch state).
  *
  * Complements [[KmvSketch]]: KMV is exact below k and supports set
  * algebra (union/intersection estimates); HLL holds the same accuracy
  * with ~8× less state at large cardinalities and constant-time updates —
  * the right default for per-group distinct counts over billions of keys.
  *
  * Determinism: the register array after any sequence of adds/merges is a
  * pure function of the hash SET — independent of order, partitioning, or
  * merge shape. The estimator is evaluated once at read time; its
  * harmonic sum is over at most m exact powers of two, so cross-engine
  * recomputations agree to ~1 ulp (gate-rounded).
  *
  * Bucketing: top p hash bits pick the register; ρ = leading-zero count
  * of the remaining 64−p bits + 1 (all-zero remainder → 64−p+1). The
  * 64-bit regime needs no large-range correction; below 2.5m with empty
  * registers the linear-counting estimate applies (standard practice). */
final class Hll private (val p: Int, val registers: Array[Byte]) {
  def this(p: Int) = this(p, new Array[Byte](1 << p))
  require(p >= 4 && p <= 16, "precision must be in [4, 16]")

  def m: Int = 1 << p

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rho =
      if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > registers(idx)) registers(idx) = rho.toByte
  }

  def merge(o: Hll): Unit = {
    require(o.p == p, s"precision mismatch ($p vs ${o.p})")
    var i = 0
    while (i < registers.length) {
      if (o.registers(i) > registers(i)) registers(i) = o.registers(i)
      i += 1
    }
  }

  /** Registers with ρ > 0 — the linear-counting occupancy. */
  def nonzero: Int = {
    var n = 0
    var i = 0
    while (i < registers.length) { if (registers(i) != 0) n += 1; i += 1 }
    n
  }

  def estimate: Double = {
    val mm = m.toDouble
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / mm)
    }
    var sum = 0.0
    var i = 0
    while (i < registers.length) {
      sum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      i += 1
    }
    val raw = alpha * mm * mm / sum
    val zeros = m - nonzero
    if (raw <= 2.5 * mm && zeros > 0) mm * math.log(mm / zeros) else raw
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + registers.length)
    out(0) = p.toByte
    System.arraycopy(registers, 0, out, 1, registers.length)
    out
  }

  def copy(): Hll = new Hll(p, registers.clone())
}

object Hll {
  def deserialize(bytes: Array[Byte]): Hll = {
    require(bytes.length >= 1, "empty HLL blob")
    val p = bytes(0).toInt
    require(p >= 4 && p <= 16, s"corrupt HLL blob (p=$p)")
    require(bytes.length == 1 + (1 << p),
      s"corrupt HLL blob (${bytes.length} bytes for p=$p)")
    val regs = new Array[Byte](1 << p)
    System.arraycopy(bytes, 1, regs, 0, regs.length)
    new Hll(p, regs)
  }
}
