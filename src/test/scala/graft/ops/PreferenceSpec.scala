package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bradley–Terry MM fitting (Preference.bradleyTerry / pairCounts). */
class PreferenceSpec extends SparkTestBase {

  // A beats B twice, B beats C once, A beats C once
  private def feed = {
    import spark.implicits._
    Seq(("A", "B"), ("A", "B"), ("B", "C"), ("A", "C"))
      .toDF("w", "l")
  }

  test("pairCounts canonicalizes unordered pairs") {
    val got = Preference.pairCounts(feed, col("w"), col("l"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("A", "B") -> (2L, 0L), ("B", "C") -> (1L, 0L),
      ("A", "C") -> (1L, 0L)))
  }

  test("bradleyTerry: two hand-worked MM rounds") {
    // round 1 from uniform: u = (2/3, 2/9, 0) -> pi = (3/4, 1/4, 0)
    // round 2: den_A = 2/1 + 1/(3/4) = 10/3, u_A = 9/10;
    //          den_B = 2/1 + 1/(1/4) = 6,   u_B = 1/6; tot = 16/15
    //          pi = (27/32, 5/32, 0)
    val got = Preference.bradleyTerry(feed, col("w"), col("l"),
        iters = 2)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("A")._1 == 3L && got("A")._2 == 3L)
    assert(got("B")._1 == 1L && got("B")._2 == 3L)
    assert(got("C")._1 == 0L && got("C")._2 == 2L)
    assert(math.abs(got("A")._3 - 27.0 / 32.0) < 1e-12)
    assert(math.abs(got("B")._3 - 5.0 / 32.0) < 1e-12)
    assert(got("C")._3 == 0.0)
  }

  test("bradleyTerry: self-pairs carry no signal") {
    import spark.implicits._
    val withSelf = feed.union(Seq(("A", "A")).toDF("w", "l"))
    val a = Preference.bradleyTerry(feed, col("w"), col("l"), iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    val b = Preference.bradleyTerry(withSelf, col("w"), col("l"),
      iters = 2).collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(a.sameElements(b))
  }

  test("bradleyTerry: stronger item converges above weaker") {
    val got = Preference.bradleyTerry(feed, col("w"), col("l"),
        iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("A") > got("B") && got("B") > got("C"))
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("updatePairStore: incremental ledger equals the one-shot fit") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("pref_store").toString + "/pairs"
    val half1 = Seq(("A", "B"), ("B", "C")).toDF("w", "l")
    val half2 = Seq(("A", "B"), ("A", "C")).toDF("w", "l")
    Preference.updatePairStore(spark, half1, col("w"), col("l"), path)
    Preference.updatePairStore(spark, half2, col("w"), col("l"), path)
    val fromStore = Preference.bradleyTerryFromCounts(
      spark.read.parquet(path), iters = 2).collect().map(_.toSeq)
    val oneShot = Preference.bradleyTerry(half1.union(half2),
      col("w"), col("l"), iters = 2).collect().map(_.toSeq)
    assert(fromStore.toSeq == oneShot.toSeq)
  }

  test("bradleyTerry refuses an unbounded item universe") {
    import spark.implicits._
    val big = (0 until 50).map(i => (s"m$i", s"m${i + 1}"))
      .toDF("w", "l")
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(big, col("w"), col("l"), iters = 1,
        maxItems = 10)
    }
  }
}
