package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** One-pass parallel central-moments sketch (count/sum/min/max/m2/m3/m4 +
  * homogeneity tracking), after Pébay, "Formulas for Robust, One-Pass Parallel
  * Computation of Covariances and Arbitrary-Order Statistical Moments"
  * (SAND2008-6212).
  *
  * Semantics follow the reference kernel `crick/stats_stubs.c:12-136` and shim
  * `crick/stats.pyx`:
  *   - NaN values are skipped by `add` (stats_stubs.c:93) but still affect the
  *     `homogeneous` flag exactly like the reference vectorized update loop
  *     (stats_stubs.c:199-206): the flag is maintained on every observed value.
  *   - Documented divergences from the reference (SURVEY.md §7.4):
  *     (a) `max` is initialised to -Inf, not the reference's `-DBL_MIN`
  *         (stats_stubs.c:32) which mis-reports the max of all-negative
  *         streams;
  *     (b) weighted add treats `(x, count)` as `count` repeats of `x`
  *         (n2=count, sum2=x*count); the reference passes sum2=x
  *         (stats_stubs.c:94) which skews weighted means for count>1. For
  *         count==1 — the only case its tests exercise — both agree.
  */
final class MomentsSketch extends Serializable {
  var count: Long = 0L
  var sum: Double = 0.0
  var min: Double = Double.MaxValue
  var max: Double = Double.NegativeInfinity
  var m2: Double = 0.0
  var m3: Double = 0.0
  var m4: Double = 0.0
  var homogeneous: Boolean = true
  var firstValue: Double = 0.0

  /** Track the homogeneous/first-value state for an observed value (including
    * NaN), mirroring the reference update loop (stats_stubs.c:199-206). */
  @inline private def observe(x: Double): Unit = {
    if (count == 0L) firstValue = x
    else if (homogeneous && firstValue != x) homogeneous = false
  }

  /** Pébay pairwise combine of this state with a batch summarised by
    * (n2, sum2, min2, max2, m2_2, m3_2, m4_2). Update order (m4, m3, m2)
    * matches stats_stubs.c:47-75 for bit-level parity. */
  private def doUpdate(n2: Long, sum2: Double, min2: Double, max2: Double,
                       m4_2: Double, m3_2: Double, m2_2: Double): Unit = {
    val u2 = sum2 / n2
    val delta = if (count != 0L) u2 - (sum / count) else u2
    val n1 = count
    val n = n1 + n2
    val n1n2 = n1.toDouble * n2.toDouble
    val n1sq = n1.toDouble * n1.toDouble
    val n2sq = n2.toDouble * n2.toDouble
    val deltaDivN = delta / n
    val deltaDivN2 = deltaDivN * deltaDivN
    val deltaDivN3 = deltaDivN2 * deltaDivN
    if (min2 < min) min = min2
    if (max2 > max) max = max2
    m4 += (m4_2 +
      n1n2 * (n1sq - n1n2 + n2sq) * delta * deltaDivN3 +
      6.0 * (n1sq * m2_2 + n2sq * m2) * deltaDivN2 +
      4.0 * (n1 * m3_2 - n2 * m3) * deltaDivN)
    m3 += (m3_2 +
      n1n2 * (n1 - n2).toDouble * delta * deltaDivN2 +
      3.0 * (n1 * m2_2 - n2 * m2) * deltaDivN)
    m2 += m2_2 + n1n2 * delta * deltaDivN
    count += n2
    sum += sum2
  }

  /** Add `c` repeats of value `x`. NaN is skipped (but tracked for
    * homogeneity); `c` must be > 0. */
  def add(x: Double, c: Long = 1L): Unit = {
    observe(x)
    if (!java.lang.Double.isNaN(x)) {
      // c repeats of a single value form a zero-central-moment batch.
      doUpdate(c, x * c, x, x, 0.0, 0.0, 0.0)
    }
  }

  /** In-place merge of another sketch (stats_stubs.c:78-90). */
  /** NOTE (reference-inherited): like stats_merge (stats_stubs.c:77), a
    * partial whose count == 0 is dropped wholesale — including homogeneity
    * state from NaN-only input. With NaNs present, `homogeneous` (and thus
    * skew/kurt NaN-ness) can therefore depend on how rows were partitioned,
    * exactly as it does for the reference under dask's partitioned merge. */
  def merge(other: MomentsSketch): Unit = {
    if (other.count == 0L) return
    if (count == 0L) {
      // DIVERGENCE (SURVEY §7.4.10): adopt other's homogeneity state
      // wholesale. The reference's stats_merge (stats_stubs.c:81-87) never
      // adopts first_value, so merging into a fresh sketch would compute
      // homogeneous = (0.0 == other.first_value) — usually false. Adoption is
      // deliberate: partition-invariant and equal to single-stream semantics
      // under Spark's merge-from-fresh-buffer lifecycle.
      firstValue = other.firstValue
      homogeneous = other.homogeneous
    } else if (homogeneous && !other.homogeneous) {
      homogeneous = false
    } else if (homogeneous && other.homogeneous) {
      homogeneous = firstValue == other.firstValue
    }
    doUpdate(other.count, other.sum, other.min, other.max,
      other.m4, other.m3, other.m2)
  }

  def mean: Double = if (count != 0L) sum / count else Double.NaN
  def variance(ddof: Long): Double =
    if (count != 0L) m2 / (count - ddof) else Double.NaN
  def stddev(ddof: Long): Double = math.sqrt(variance(ddof))
  def minOrNaN: Double = if (count != 0L) min else Double.NaN
  def maxOrNaN: Double = if (count != 0L) max else Double.NaN

  /** Skewness (stats_stubs.c:113-123). */
  def skew(bias: Boolean): Double = {
    if (homogeneous) return Double.NaN
    val n = count.toDouble
    val mm2 = m2 / count
    val mm3 = m3 / count
    val s = if (mm2 != 0.0) mm3 / (math.sqrt(mm2) * mm2) else 0.0
    if (!bias && n > 2 && mm2 > 0) math.sqrt((n - 1.0) * n) / (n - 2.0) * s
    else s
  }

  /** Kurtosis (stats_stubs.c:126-136). */
  def kurt(fisher: Boolean, bias: Boolean): Double = {
    if (homogeneous) return Double.NaN
    val n = count.toDouble
    val mm2 = m2 / count
    val mm4 = m4 / count
    var k = if (mm2 != 0.0) mm4 / (mm2 * mm2) else 0.0
    if (!bias && n > 3 && mm2 > 0)
      k = ((n * n - 1.0) * k - 9.0 * n + 15.0) / ((n - 2.0) * (n - 3.0))
    if (fisher) k - 3.0 else k
  }

  /** Fixed 65-byte little-endian state (cf. stats.pyx:74-91 9-tuple). */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(65).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(count).putDouble(sum).putDouble(min).putDouble(max)
      .putDouble(m2).putDouble(m3).putDouble(m4)
      .put(if (homogeneous) 1.toByte else 0.toByte)
      .putDouble(firstValue)
    bb.array()
  }
}

object MomentsSketch {
  def deserialize(bytes: Array[Byte]): MomentsSketch = {
    require(bytes.length == 65,
      s"not a summary_stats sketch: ${bytes.length} bytes (need 65)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val s = new MomentsSketch
    s.count = bb.getLong(); s.sum = bb.getDouble()
    s.min = bb.getDouble(); s.max = bb.getDouble()
    s.m2 = bb.getDouble(); s.m3 = bb.getDouble(); s.m4 = bb.getDouble()
    s.homogeneous = bb.get() != 0
    s.firstValue = bb.getDouble()
    s
  }
}
