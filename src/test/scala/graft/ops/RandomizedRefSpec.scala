package graft.ops

import graft.SparkTestBase
import graft.api.{functions => gf}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized tests against independent in-memory references (MonoidLawsSpec
  * style: deterministic seeds, no scalacheck shrinking nondeterminism).
  * These cover the distributed operators whose unit specs use hand-planted
  * fixtures: random graphs, random boundaries, random unicode text. */
class RandomizedRefSpec extends SparkTestBase {
  import spark.implicits._

  private def trials(n: Int)(body: Random => Unit): Unit =
    (0 until n).foreach(i => body(new Random(i * 104729 + 13)))

  test("components == union-find reference on random graphs (both tiers)") {
    trials(4) { rnd =>
      val nIds = 2 + rnd.nextInt(60)
      val nEdges = rnd.nextInt(80)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nIds).toLong, rnd.nextInt(nIds).toLong))
        .filter(e => e._1 != e._2)
        .map(e => if (e._1 < e._2) e else e.swap)
      if (edges.nonEmpty) {
        // driver reference: naive union-find with min-id relabel
        val parent = Array.tabulate(nIds)(identity)
        def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
        val minOf = collection.mutable.Map[Int, Long]()
        (0 until nIds).foreach { i =>
          val r = find(i)
          minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), i.toLong)
        }
        val expected = (0 until nIds).map(i => i.toLong -> minOf(find(i))).toMap
        val pairs = edges.toDF("idA", "idB")
        val ids = (0 until nIds).map(_.toLong).toDF("id")
        for (thresh <- Seq(1 << 20, 0)) {
          val got = Dedup.components(pairs, allIds = Some(ids),
              localEdgeThreshold = thresh)
            .as[(Long, Long)].collect().toMap
          assert(got == expected, s"tier=$thresh nIds=$nIds edges=$edges")
        }
      }
    }
  }

  test("assignBuckets == searchsorted reference on random boundaries") {
    trials(4) { rnd =>
      val k = 2 + rnd.nextInt(12)
      // sorted boundaries, possibly with duplicates
      val bounds = Array.fill(k - 1)(math.floor(rnd.nextGaussian() * 5))
        .sorted
      val vals = Seq.fill(50)(rnd.nextInt(5) match {
        case 0 => bounds(rnd.nextInt(bounds.length)) // exactly on a boundary
        case _ => rnd.nextGaussian() * 8
      })
      val expected = vals.map(v => bounds.count(v >= _))
      val got = Partitioning.assignBuckets(vals.toDF("v"), "v", bounds)
        .select("bucket").as[Int].collect().toSeq
      assert(got == expected, s"bounds=${bounds.toSeq}")
    }
  }

  test("token_count == regex reference on random unicode text") {
    trials(3) { rnd =>
      val alphabet = "ab λπ中文\tñé\n\r.!1"
      val texts = Seq.fill(60)(
        (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val expected = texts.map(_.split("[ \t\n\r]+").count(_.nonEmpty))
      val got = texts.toDF("t").select(gf.token_count(col("t"))).as[Int].collect().toSeq
      assert(got == expected)
    }
  }

  test("saltedJoin == plain join on random skew/factor/heavy sets") {
    trials(3) { rnd =>
      val nKeys = 1 + rnd.nextInt(20)
      val left = Seq.fill(200)((rnd.nextInt(nKeys).toLong, rnd.nextInt(100)))
        .toDF("k", "v").repartition(5)
      val right = (0 until nKeys).filter(_ => rnd.nextBoolean())
        .map(i => (i.toLong, s"r$i")).toDF("k", "name")
      if (right.count() > 0) {
        val heavy = (0 until nKeys).filter(_ => rnd.nextInt(3) == 0).map(_.toLong)
        val factor = 2 + rnd.nextInt(6)
        val plain = left.join(right, "k").groupBy("k")
          .agg(count(lit(1)), sum("v")).as[(Long, Long, Long)].collect().toSet
        if (heavy.nonEmpty) {
          val salted = Skew.saltedJoin(left, right, "k", factor, heavy)
            .groupBy("k").agg(count(lit(1)), sum("v"))
            .as[(Long, Long, Long)].collect().toSet
          assert(salted == plain, s"heavy=$heavy factor=$factor")
        }
      }
    }
  }

  test("token_count_bpe == Java regex reference; SQL path agrees") {
    val pat = graft.api.functions.BpeTokenPattern.r
    val docs = spark.read.parquet(sf("documents")).limit(200).cache()
    val expected = docs.select("text").as[String].collect()
      .map(t => pat.findAllIn(t).size)
    val got = docs.select(gf.token_count_bpe(col("text"))).as[Int].collect()
    assert(got.toSeq == expected.toSeq)
    graft.api.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("__bpe_docs")
    val sqlGot = spark.sql("SELECT token_count_bpe(text) FROM __bpe_docs")
      .as[Int].collect()
    assert(sqlGot.toSeq == expected.toSeq)
  }
}
