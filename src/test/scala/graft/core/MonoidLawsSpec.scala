package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the monoid laws the reference only spot-checks
  * (SURVEY.md §5): the laws that make distributed partial aggregation and
  * streaming state merges correct regardless of partitioning.
  *
  * Exact sketches (MomentsSketch) satisfy the laws bit-for-bit (up to fp
  * tolerance from reordering); approximate sketches (TDigest, SpaceSaving)
  * satisfy them up to their accuracy contracts, checked via invariants.
  */
class MonoidLawsSpec extends AnyFunSuite {

  /** Deterministic generator: mixes magnitudes, duplicates, and edge values. */
  private def genValues(rnd: Random): List[Double] = {
    val n = rnd.nextInt(200)
    List.fill(n) {
      rnd.nextInt(6) match {
        case 0 => 0.0
        case 1 => (rnd.nextInt(10) - 5).toDouble // heavy duplicates
        case 2 => rnd.nextGaussian() * 1e-6
        case 3 => rnd.nextGaussian() * 1e6
        case _ => rnd.nextDouble() * 2e6 - 1e6
      }
    }
  }

  private def trials(seeds: Int)(body: Random => Unit): Unit =
    (0 until seeds).foreach(i => body(new Random(i * 7919 + 1)))

  private def stats(xs: Seq[Double]): MomentsSketch = {
    val s = new MomentsSketch
    xs.foreach(s.add(_, 1L))
    s
  }

  private def close(a: Double, b: Double, tol: Double = 1e-7): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("moments: update ≡ merge of singletons; split point is irrelevant") {
    trials(100) { rnd =>
      val xs = genValues(rnd)
      if (xs.nonEmpty) {
        val whole = stats(xs)
        val k = xs.length * rnd.nextInt(101) / 100
        val (l, r) = xs.splitAt(k)
        val merged = stats(l)
        merged.merge(stats(r))
        assert(merged.count == whole.count)
        assert(close(merged.sum, whole.sum))
        assert(close(merged.m2, whole.m2, 1e-6))
        assert(merged.minOrNaN == whole.minOrNaN && merged.maxOrNaN == whole.maxOrNaN)
      }
    }
  }

  test("moments: merge associativity (a⊕b)⊕c ≈ a⊕(b⊕c); empty is identity") {
    trials(100) { rnd =>
      val a = genValues(rnd); val b = genValues(rnd); val c = genValues(rnd)
      val l = stats(a); l.merge(stats(b)); l.merge(stats(c))
      val r2 = stats(b); r2.merge(stats(c))
      val r = stats(a); r.merge(r2)
      assert(l.count == r.count && close(l.sum, r.sum) && close(l.m2, r.m2, 1e-6))
      val e = stats(a)
      e.merge(new MomentsSketch)
      assert(e.count == stats(a).count && close(e.m3, stats(a).m3, 1e-6))
    }
  }

  test("tdigest: merged quantiles stay within [min,max], monotone, and near exact rank") {
    trials(100) { rnd =>
      val a = genValues(rnd); val b = genValues(rnd)
      if ((a.length + b.length) >= 10) {
        val ta = TDigest(100.0); a.foreach(ta.add(_))
        val tb = TDigest(100.0); b.foreach(tb.add(_))
        ta.merge(tb)
        val all = (a ++ b).sorted
        val qs = Array(0.1, 0.25, 0.5, 0.75, 0.9)
        val est = ta.quantiles(qs)
        // monotone and bounded
        est.sliding(2).foreach { w => if (w.length == 2) assert(w(0) <= w(1)) }
        assert(est.head >= all.head && est.last <= all.last)
        // q-space error: rank of estimate within 0.15 of target (loose bound
        // for arbitrary adversarial multisets at c=100)
        qs.zip(est).foreach { case (q, e) =>
          val rank = all.count(_ <= e).toDouble / all.length
          val rankLo = all.count(_ < e).toDouble / all.length
          assert(rankLo - 0.15 <= q && q <= rank + 0.15,
            s"q=$q est=$e rank=[$rankLo,$rank] n=${all.length}")
        }
      }
    }
  }

  test("space-saving: merge count bounds hold for every item (count ≤ actual+err budget)") {
    trials(200) { rnd =>
      val a = List.fill(rnd.nextInt(300))(rnd.nextInt(31).toLong)
      val b = List.fill(rnd.nextInt(300))(rnd.nextInt(31).toLong)
      val sa = new SpaceSavingLong(16); a.foreach(sa.add(_))
      val sb = new SpaceSavingLong(16); b.foreach(sb.add(_))
      sa.merge(sb)
      val exact = (a ++ b).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val slots = sa.topkSlots(sa.size)
      slots.foreach { s =>
        val item = sa.items(s)
        val actual = exact.getOrElse(item, 0L)
        // guarantee: count - error <= actual <= count
        assert(sa.counts(s) - sa.errors(s) <= actual,
          s"item $item count=${sa.counts(s)} err=${sa.errors(s)} actual=$actual")
        assert(actual <= sa.counts(s))
      }
      // sorted by (count desc, error asc)
      slots.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(sa.counts(w(0)) > sa.counts(w(1)) ||
            (sa.counts(w(0)) == sa.counts(w(1)) && sa.errors(w(0)) <= sa.errors(w(1))))
      }
    }
  }
}
