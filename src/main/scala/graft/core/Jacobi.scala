package graft.core

/** Deterministic cyclic Jacobi eigendecomposition of a small symmetric
  * matrix (covariance/Gram matrices of embedding dimensionality — d ≤ a few
  * hundred; the O(d³) driver-side solve is nothing next to one corpus
  * scan).
  *
  * Determinism matters here the same way it does for `exact_sum`-fed
  * k-means: PCA bases feed dedup/similarity decisions, and a rotation
  * order that depends on float comparisons with platform-varying libm
  * calls would make two runs of the same pipeline disagree. This
  * implementation fixes every source of drift:
  *  - strict CYCLIC sweep order (p = 0..d−2, q = p+1..d−1), never
  *    "largest off-diagonal first" (which ties on equal magnitudes);
  *  - rotations computed with the standard stable formulas (Golub & Van
  *    Loan §8.5) from +,−,×,÷,sqrt only — all IEEE-exact operations,
  *    no trig;
  *  - eigenpairs sorted by (eigenvalue desc, original index asc);
  *  - each eigenvector's sign normalized so its largest-|·| component
  *    (lowest index on exact ties) is positive.
  */
object Jacobi {

  /** Eigendecomposition of symmetric `a` (full d×d, row-major; only the
    * values are read — the caller guarantees symmetry). Returns
    * (eigenvalues, eigenvectors) sorted by eigenvalue descending;
    * eigenvectors(k) is the unit eigenvector for eigenvalues(k).
    * Convergence: off-diagonal Frobenius mass ≤ `tol` × on-diagonal mass,
    * or `maxSweeps` full sweeps. */
  def symEigen(a: Array[Array[Double]], tol: Double = 1e-14,
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    require(d >= 1 && a.forall(_.length == d), "matrix must be square")
    // working copy + accumulated rotations
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      s
    }
    def diagMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { s += m(i)(i) * m(i)(i); i += 1 }
      math.max(s, java.lang.Double.MIN_NORMAL)
    }

    var sweep = 0
    while (sweep < maxSweeps && offMass() > tol * tol * diagMass()) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (apq != 0.0) {
            // stable rotation: t = sgn(theta)/(|theta|+sqrt(theta^2+1))
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // update m = J^T m J touching only rows/cols p,q
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              k += 1
            }
            // rotated pair is exactly annihilated by construction
            m(p)(q) = 0.0
            m(q)(p) = 0.0
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    // sort by (eigenvalue desc, original column asc); fix signs
    val order = (0 until d).sortBy(i => (-m(i)(i), i))
    val evals = order.map(i => m(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      var best = 0
      var k = 1
      while (k < d) {
        if (math.abs(col(k)) > math.abs(col(best))) best = k
        k += 1
      }
      if (col(best) < 0.0) { k = 0; while (k < d) { col(k) = -col(k); k += 1 } }
      col
    }.toArray
    (evals, evecs)
  }
}
