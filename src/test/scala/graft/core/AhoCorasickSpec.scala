package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick automaton vs a naive all-positions reference. */
class AhoCorasickSpec extends AnyFunSuite {

  private def naiveCount(text: String, pats: Seq[String]): Long =
    pats.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    }.sum

  private def naiveDistinct(text: String, pats: Seq[String]): Int =
    pats.count(p => text.contains(p))

  test("overlapping occurrences count every end position") {
    val ac = AhoCorasick.build(Seq("aa"))
    assert(ac.countMatches("aaa") == 2)
    assert(ac.countMatches("aaaa") == 3)
    assert(ac.countMatches("ab") == 0)
  }

  test("nested patterns both fire via the dict-suffix chain") {
    val ac = AhoCorasick.build(Seq("tab", "table", "able"))
    // "table" contains tab@0, table@0, able@1
    assert(ac.countMatches("table") == 3)
    assert(ac.matchStats("table") == ((3L, 3)))
    assert(ac.matchStats("tab") == ((1L, 1)))
  }

  test("duplicate patterns each count") {
    val ac = AhoCorasick.build(Seq("x", "x"))
    assert(ac.countMatches("xx") == 4)
    assert(ac.matchStats("xx")._2 == 2)
  }

  test("containsAny early-exit agrees with matchStats") {
    val ac = AhoCorasick.build(Seq("spark", "slow"))
    assert(ac.containsAny("a slow query"))
    assert(!ac.containsAny("a fast query"))
    assert(ac.matchStats("a fast query") == ((0L, 0)))
  }

  test("deterministic fuzz vs naive reference (small alphabet stresses fail links)") {
    val rng = new scala.util.Random(1234)
    val alphabet = "ab"
    for (trial <- 0 until 200) {
      val nPats = 1 + rng.nextInt(6)
      val pats = Seq.fill(nPats)(
        (0 until (1 + rng.nextInt(4)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString).distinct
      val text = (0 until rng.nextInt(60))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      val ac = AhoCorasick.build(pats)
      assert(ac.countMatches(text) == naiveCount(text, pats),
        s"trial $trial pats=$pats text=$text")
      assert(ac.matchStats(text)._2 == naiveDistinct(text, pats),
        s"trial $trial distinct pats=$pats text=$text")
      assert(ac.containsAny(text) == (naiveCount(text, pats) > 0))
    }
  }

  test("three-char alphabet fuzz with longer patterns") {
    val rng = new scala.util.Random(99)
    val alphabet = "xyz"
    for (trial <- 0 until 100) {
      val pats = Seq.fill(1 + rng.nextInt(8))(
        (0 until (1 + rng.nextInt(7)))
          .map(_ => alphabet(rng.nextInt(3))).mkString).distinct
      val text = (0 until rng.nextInt(120))
        .map(_ => alphabet(rng.nextInt(3))).mkString
      val ac = AhoCorasick.build(pats)
      assert(ac.countMatches(text) == naiveCount(text, pats), s"trial $trial")
    }
  }

  test("empty pattern list and empty patterns are rejected") {
    intercept[IllegalArgumentException](AhoCorasick.build(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
  }

  test("survives java serialization round-trip (broadcast contract)") {
    val ac = AhoCorasick.build(Seq("merge batch", "a a", "spark"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    assert(back.countMatches("a a a spark merge batch") ==
      ac.countMatches("a a a spark merge batch"))
  }
}
