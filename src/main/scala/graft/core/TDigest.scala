package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Merging t-digest (Dunning/Ertl), ported semantically from the reference
  * kernel `crick/tdigest_stubs.c` (itself a C port of tdunning/t-digest).
  *
  * Structure: a sorted array of centroids (mean, weight) plus a small unsorted
  * ingest buffer. Adds append to the buffer (amortized O(1)); a flush merge-
  * sorts the buffer and runs one merge pass gated by the k-scale function
  * `integrate(c, q) = c*(asin(2q-1)+π/2)/π` (tdigest_stubs.c:178-189).
  * Queries (quantile/cdf) run a prep pass that builds cumulative mid-weights
  * (tdigest_stubs.c:301-316) then binary-search + linear interpolation.
  *
  * Reference contracts preserved:
  *  - compression clipped to [20, 1000]; centroid capacity 2*ceil(c);
  *    buffer capacity 7.5+0.37c-2e-4c² (tdigest_stubs.c:57-66)
  *  - non-finite x silently dropped; weights <= DBL_EPSILON dropped
  *    (tdigest_stubs.c:283-286)
  *  - quantile: empty→NaN, q<=0→min, q>=1→max, single centroid→mean
  *    (tdigest_stubs.c:483-516)
  *  - cdf: empty→NaN; single-centroid min/max ramp; duplicate-mean runs via
  *    rightmost-equal bisect (tdigest_stubs.c:355-407)
  *  - merge re-adds the other digest's centroids as weighted points and folds
  *    min/max (tdigest_stubs.c:592-606)
  *  - scale multiplies weights, dropping centroids whose scaled weight
  *    <= DBL_EPSILON (tdigest_stubs.c:609-629)
  */
final class TDigest private (val compression: Double, val size: Int,
                             val bufferSize: Int) extends Serializable {
  var min: Double = Double.MaxValue
  var max: Double = -Double.MaxValue

  var nCentroids: Int = 0
  var totalWeight: Double = 0.0
  var means: Array[Double] = new Array[Double](size)
  var weights: Array[Double] = new Array[Double](size)

  // merge scratch; after queryPrep, cumWeights holds cumulative mid-weights
  private var mergeMeans: Array[Double] = new Array[Double](size)
  private var mergeWeights: Array[Double] = new Array[Double](size)

  private var bufN: Int = 0
  private var bufTotalWeight: Double = 0.0
  private val bufMeans = new Array[Double](bufferSize)
  private val bufWeights = new Array[Double](bufferSize)
  private val sortMeans = new Array[Double](bufferSize)
  private val sortWeights = new Array[Double](bufferSize)

  def bufferedWeight: Double = bufTotalWeight
  /** Total ingested weight including the unflushed buffer (tdigest.pyx:118-122). */
  def totalSize: Double = totalWeight + bufTotalWeight
  def isEmpty: Boolean = totalSize == 0.0

  def minOrNaN: Double = { flush(); if (totalWeight > 0) min else Double.NaN }
  def maxOrNaN: Double = { flush(); if (totalWeight > 0) max else Double.NaN }

  /** Bottom-up mergesort of the parallel (means, weights) buffer prefix
    * [0, n), stable, using (sortMeans, sortWeights) as scratch —
    * mirrors centroid_sort (tdigest_stubs.c:116-175). */
  private def sortBuffer(n: Int): Unit = {
    var aM = bufMeans; var aW = bufWeights
    var bM = sortMeans; var bW = sortWeights
    var width = 1
    while (width < n) {
      var i = 0
      while (i < n) {
        val mid = math.min(i + width, n)
        val end = math.min(i + 2 * width, n)
        var j = i; var k = mid; var p = i
        while (j < mid && k < end) {
          if (aM(k) < aM(j)) { bM(p) = aM(k); bW(p) = aW(k); k += 1 }
          else { bM(p) = aM(j); bW(p) = aW(j); j += 1 }
          p += 1
        }
        while (j < mid) { bM(p) = aM(j); bW(p) = aW(j); j += 1; p += 1 }
        while (k < end) { bM(p) = aM(k); bW(p) = aW(k); k += 1; p += 1 }
        i = end
      }
      val tM = aM; val tW = aW; aM = bM; aW = bW; bM = tM; bW = tW
      width *= 2
    }
    if (!(aM eq bufMeans)) {
      System.arraycopy(aM, 0, bufMeans, 0, n)
      System.arraycopy(aW, 0, bufWeights, 0, n)
    }
  }

  /** k-scale function (tdigest_stubs.c:178-189). Uses [[TDigest.fastAsin]]:
    * Math.asin is a non-intrinsified native call on the JVM and dominates
    * flush cost (~10 calls per add amortized); the polynomial is within
    * ~2 ulp, far inside the k-scale bound's tolerance. */
  @inline private def integrate(q0: Double): Double = {
    val q = if (q0 > 1) 1.0 else q0
    compression * (TDigest.fastAsin(2 * q - 1) + math.Pi / 2) / math.Pi
  }

  // state for the in-progress merge pass
  private var mergeN = 0

  /** One step of the merge pass (centroid_merge, tdigest_stubs.c:192-216). */
  private def centroidMerge(weightSoFar: Double, k1: Double,
                            u: Double, w: Double): Double = {
    val k2 = integrate((weightSoFar + w) / totalWeight)
    if (mergeN == 0) {
      mergeN = 1
      mergeMeans(0) = u; mergeWeights(0) = w
      k1
    } else if ((k2 - k1) <= 1) {
      val i = mergeN - 1
      mergeWeights(i) += w
      mergeMeans(i) += (u - mergeMeans(i)) * w / mergeWeights(i)
      k1
    } else {
      val i = mergeN
      mergeN += 1
      mergeMeans(i) = u; mergeWeights(i) = w
      integrate(weightSoFar / totalWeight)
    }
  }

  /** Merge the ingest buffer into the centroid array (tdigest_flush,
    * tdigest_stubs.c:219-273). */
  def flush(): Unit = {
    if (bufN == 0) return
    sortBuffer(bufN)
    if (min > bufMeans(0)) min = bufMeans(0)
    if (max < bufMeans(bufN - 1)) max = bufMeans(bufN - 1)

    val n = nCentroids
    nCentroids = 0
    mergeN = 0
    totalWeight += bufTotalWeight
    bufTotalWeight = 0.0

    var k1 = 0.0
    var weightSoFar = 0.0
    var i = 0; var j = 0
    while (i < bufN && j < n) {
      var m = 0.0; var w = 0.0
      if (bufMeans(i) < means(j)) { m = bufMeans(i); w = bufWeights(i); i += 1 }
      else { m = means(j); w = weights(j); j += 1 }
      k1 = centroidMerge(weightSoFar, k1, m, w)
      weightSoFar += w
    }
    while (i < bufN) {
      k1 = centroidMerge(weightSoFar, k1, bufMeans(i), bufWeights(i)); weightSoFar += bufWeights(i); i += 1
    }
    while (j < n) {
      k1 = centroidMerge(weightSoFar, k1, means(j), weights(j)); weightSoFar += weights(j); j += 1
    }
    bufN = 0
    nCentroids = mergeN

    var t = means; means = mergeMeans; mergeMeans = t
    t = weights; weights = mergeWeights; mergeWeights = t
  }

  /** Point add (tdigest_add, tdigest_stubs.c:276-298). Caller guarantees
    * w finite and > 0; non-finite x and w <= DBL_EPSILON are dropped. */
  def add(x: Double, w: Double = 1.0): Unit = {
    if (java.lang.Double.isInfinite(x) || java.lang.Double.isNaN(x) ||
        w <= TDigest.DblEpsilon) return
    if (bufN == bufferSize) flush()
    bufMeans(bufN) = x
    bufWeights(bufN) = w
    bufN += 1
    bufTotalWeight += w
  }

  /** Build cumulative mid-weights into mergeWeights (tdigest_query_prep,
    * tdigest_stubs.c:301-316). Invalidated by any subsequent add/merge. */
  def queryPrep(): Unit = {
    flush()
    var cum = 0.0
    var i = 0
    while (i < nCentroids) {
      mergeMeans(i) = means(i)
      mergeWeights(i) = cum + weights(i) / 2.0
      cum += weights(i)
      i += 1
    }
  }

  private def bisectWeight(index: Double, lo0: Int, hi0: Int): Int = {
    var lo = lo0; var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (mergeWeights(mid) < index) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def bisectLeftMean(x: Double, lo0: Int, hi0: Int): Int = {
    var lo = lo0; var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (mergeMeans(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def bisectRightMean(x: Double, lo0: Int, hi0: Int): Int = {
    var lo = lo0; var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (x < mergeMeans(mid)) hi = mid else lo = mid + 1
    }
    if (lo > 0 && mergeMeans(lo - 1) == x) lo -= 1
    lo
  }

  /** Quantile after queryPrep() (tdigest_quantile, tdigest_stubs.c:483-516). */
  def quantilePrepped(q: Double): Double = {
    if (totalWeight == 0) return Double.NaN
    if (q <= 0) return min
    if (q >= 1) return max
    if (nCentroids == 1) return means(0)

    val index = q * totalWeight
    val i = bisectWeight(index, 0, nCentroids)
    var x0 = 0.0; var y0 = 0.0; var x1 = 0.0; var y1 = 0.0
    if (i == 0) { x0 = 0.0; y0 = min }
    else { x0 = mergeWeights(i - 1); y0 = mergeMeans(i - 1) }
    if (i == nCentroids) { x1 = totalWeight; y1 = max }
    else { x1 = mergeWeights(i); y1 = mergeMeans(i) }
    y0 + (index - x0) * (y1 - y0) / (x1 - x0)
  }

  /** CDF after queryPrep() (tdigest_cdf, tdigest_stubs.c:355-407). */
  def cdfPrepped(x: Double): Double = {
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) {
      if (x < min) return 0.0
      if (x > max) return 1.0
      if (max - min < TDigest.DblEpsilon) return 0.5
      return (x - min) / (max - min)
    }
    if (x >= max) return 1.0
    if (x <= min) return 0.0

    val iL = bisectLeftMean(x, 0, nCentroids)
    if (x < means(0)) {
      val x0 = min; val x1 = mergeMeans(0)
      val dw = mergeWeights(0) / 2.0
      dw * (x - x0) / (x1 - x0) / totalWeight
    } else if (iL == nCentroids) {
      val x0 = means(iL - 1); val x1 = max
      val dw = weights(iL - 1) / 2.0
      1.0 - dw * (x1 - x) / (x1 - x0) / totalWeight
    } else if (means(iL) == x) {
      val iR = bisectRightMean(x, iL, nCentroids)
      mergeWeights(iR) / totalWeight
    } else {
      val x0 = means(iL - 1); val x1 = means(iL)
      val dw = (weights(iL - 1) + weights(iL)) / 2.0
      (mergeWeights(iL - 1) + dw * (x - x0) / (x1 - x0)) / totalWeight
    }
  }

  def quantile(q: Double): Double = { queryPrep(); quantilePrepped(q) }
  def cdf(x: Double): Double = { queryPrep(); cdfPrepped(x) }

  /** Quantiles for many probes with a single prep pass. */
  def quantiles(qs: Array[Double]): Array[Double] = {
    queryPrep(); qs.map(quantilePrepped)
  }
  def cdfs(xs: Array[Double]): Array[Double] = { queryPrep(); xs.map(cdfPrepped) }

  /** NumPy-compatible histogram over explicit monotone bin edges
    * (tdigest.pyx:165-229): hist(i) = (cdf(e_{i+1}) - cdf(e_i)) * size. */
  def histogram(binEdges: Array[Double]): Array[Double] = {
    val n = binEdges.length - 1
    val hist = new Array[Double](n)
    val sz = totalSize
    if (sz != 0) {
      val c = cdfs(binEdges)
      var i = 0
      while (i < n) { hist(i) = (c(i + 1) - c(i)) * sz; i += 1 }
    }
    hist
  }

  /** Equal-width edges for an int bin count, replicating numpy linspace usage
    * in tdigest.pyx:188-216 (degenerate range widened by ±0.5). */
  def histogramEdges(bins: Int): Array[Double] = {
    var left = 0.0; var right = 0.0
    if (totalSize != 0) { left = minOrNaN; right = maxOrNaN }
    if (right == left) { left -= 0.5; right += 0.5 }
    val edges = new Array[Double](bins + 1)
    val step = (right - left) / bins
    var i = 0
    while (i <= bins) { edges(i) = left + step * i; i += 1 }
    edges(bins) = right
    edges
  }

  /** In-place merge (tdigest_merge, tdigest_stubs.c:592-606). `other` is
    * flushed but not otherwise mutated. */
  def merge(other: TDigest): Unit = {
    other.flush()
    if (other.totalWeight != 0) {
      var i = 0
      while (i < other.nCentroids) {
        add(other.means(i), other.weights(i))
        i += 1
      }
      if (min > other.min) min = other.min
      if (max < other.max) max = other.max
    }
  }

  /** In-place weight scaling (tdigest_scale, tdigest_stubs.c:609-629). */
  def scaleInPlace(factor: Double): Unit = {
    flush()
    if (totalWeight != 0) {
      var tw = 0.0
      var j = 0
      var i = 0
      while (i < nCentroids) {
        val w = weights(i) * factor
        if (w > TDigest.DblEpsilon) {
          means(j) = means(i)
          weights(j) = w
          tw += w
          j += 1
        }
        i += 1
      }
      totalWeight = tw
      nCentroids = j
    }
  }

  /** Flushed little-endian state: compression, min, max, totalWeight,
    * ncentroids, then (mean, weight) pairs (cf. tdigest.pyx:246-263). */
  def serialize(): Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(8 * 4 + 4 + 16 * nCentroids)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(compression).putDouble(min).putDouble(max)
      .putDouble(totalWeight).putInt(nCentroids)
    var i = 0
    while (i < nCentroids) {
      bb.putDouble(means(i)).putDouble(weights(i)); i += 1
    }
    bb.array()
  }
}

object TDigest {
  val DblEpsilon: Double = java.lang.Math.ulp(1.0) // 2.220446049250313e-16

  // FDLIBM asin rational approximation R(z) = z·P(z)/Q(z) on z ∈ [0, 0.25]
  // (freely-distributable libm, Sun Microsystems; standard constants).
  private val pS0 = 1.66666666666666657415e-01
  private val pS1 = -3.25565818622400915405e-01
  private val pS2 = 2.01212532134862925881e-01
  private val pS3 = -4.00555345006794114027e-02
  private val pS4 = 7.91534994289814532176e-04
  private val pS5 = 3.47933107596021167570e-05
  private val qS1 = -2.40339491173441421878e+00
  private val qS2 = 2.02094576023350569471e+00
  private val qS3 = -6.88283971605453293030e-01
  private val qS4 = 7.70381505559019352791e-02

  @inline private def asinR(z: Double): Double = {
    val p = z * (pS0 + z * (pS1 + z * (pS2 + z * (pS3 + z * (pS4 + z * pS5)))))
    val q = 1.0 + z * (qS1 + z * (qS2 + z * (qS3 + z * qS4)))
    p / q
  }

  /** asin within a few ulp of Math.asin, ~6× faster (pure flops + one sqrt;
    * Math.asin is a non-intrinsified native call). |x| ≤ 0.5: x + x·R(x²);
    * else the half-angle identity asin(x) = π/2 − 2·asin(√((1−|x|)/2)).
    * Out-of-domain → NaN, matching Math.asin. */
  def fastAsin(x: Double): Double = {
    val a = math.abs(x)
    if (!(a <= 1.0)) return Double.NaN // also catches NaN
    val r =
      if (a <= 0.5) a + a * asinR(a * a)
      else {
        val z = (1.0 - a) * 0.5
        val s = math.sqrt(z)
        math.Pi / 2 - 2.0 * (s + s * asinR(z))
      }
    if (x < 0) -r else r
  }

  def apply(compression: Double = 100.0): TDigest = {
    val c = if (compression < 20) 20.0
            else if (compression > 1000) 1000.0 else compression
    val size = 2 * math.ceil(c).toInt
    val bufferSize = (7.5 + 0.37 * c - 2e-4 * c * c).toInt
    new TDigest(c, size, bufferSize)
  }

  def deserialize(bytes: Array[Byte]): TDigest = {
    require(bytes.length >= 36,
      s"not a t-digest sketch: ${bytes.length} bytes (need >= 36)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val c = bb.getDouble()
    require(c >= 20.0 && c <= 1000.0,
      s"not a t-digest sketch: compression $c outside [20, 1000]")
    val t = TDigest(c)
    t.min = bb.getDouble(); t.max = bb.getDouble()
    t.totalWeight = bb.getDouble()
    val n = bb.getInt()
    require(n >= 0 && n <= t.means.length && bytes.length == 36 + 16 * n,
      s"corrupt t-digest sketch: $n centroids in ${bytes.length} bytes")
    t.nCentroids = n
    var i = 0
    while (i < n) { t.means(i) = bb.getDouble(); t.weights(i) = bb.getDouble(); i += 1 }
    t
  }
}
