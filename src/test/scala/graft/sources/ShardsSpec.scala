package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("documents"))
    .select("doc_id", "text", "source")

  test("assignShards: in range, deterministic, partition-invariant") {
    val a1 = Shards.assignShards(docs.repartition(1), col("doc_id"), 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().sortBy(_._1)
    val a7 = Shards.assignShards(docs.repartition(7), col("doc_id"), 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().sortBy(_._1)
    assert(a1.sameElements(a7))
    assert(a1.forall { case (_, s) => s >= 0 && s < 8 })
    // every shard populated on 500 rows / 8 shards
    assert(a1.map(_._2).distinct.length == 8)
  }

  test("assignShardsOrdered: rank-contiguous, balanced, partition-invariant") {
    val n = docs.count()
    def assigned(parts: Int) = Shards.assignShardsOrdered(
        docs.repartition(parts).withColumn("len", length(col("text"))),
        col("len"), col("doc_id"), 8)
      .select("doc_id", "len", "shard")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    val a1 = assigned(1)
    assert(a1.sameElements(assigned(7)), "partition-invariant")
    // sizes within one row of each other
    val sizes = a1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    assert(sizes.values.sum == n)
    // curriculum contract: shard boundaries are monotone in the order key
    val byShard = a1.groupBy(_._3)
    (0 until 7).foreach { s =>
      assert(byShard(s).map(_._2).max <= byShard(s + 1).map(_._2).min,
        s"shard $s max exceeds shard ${s + 1} min")
    }
  }

  test("epochShuffle: permutation, stripe rule, seeds differ, " +
      "partition-invariant") {
    val n = docs.count()
    def ep(seed: Long, parts: Int) = Shards.epochShuffle(
        docs.repartition(parts).select("doc_id"), col("doc_id"), seed, 8)
      .select("doc_id", "shard", "pos_in_shard")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val e1 = ep(1L, 3)
    assert(e1.toSeq == ep(1L, 11).toSeq, "partition-invariant")
    // (shard, pos) pairs tile ranks 0..n-1 exactly once: rank = pos*8+shard
    val ranks = e1.map { case (_, s, p) => p * 8 + s }.sorted.toSeq
    assert(ranks == (0L until n).toSeq, "exact rank tiling")
    // shard sizes within one row
    val sizes = e1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    // a different seed is a different permutation of the SAME ids
    val e2 = ep(2L, 3)
    assert(e2.map(_._1).toSeq == e1.map(_._1).toSeq)
    assert(e2.map(t => (t._2, t._3)).toSeq !=
      e1.map(t => (t._2, t._3)).toSeq, "seeds must permute differently")
    // and not order-by-id: the permutation actually shuffles
    val idOrder = e1.map(_._1).sorted.toSeq
    val rankOrder =
      e1.sortBy { case (_, s, p) => p * 8 + s }.map(_._1).toSeq
    assert(rankOrder != idOrder, "hash order must differ from id order")
  }

  test("mixtureInterleave: slot formula, block composition, " +
      "partition-invariant") {
    // weights src0=2 src1=1 (W=3): slots of src0's k-th row = (k/2)*3 +
    // 0 + k%2, src1's = (k/1)*3 + 2 → every 3-slot block is [s0,s0,s1]
    val weights = Seq("src0" -> 2L, "src1" -> 1L)
    def run(parts: Int) = Shards.mixtureInterleave(
        docs.repartition(parts), "source", col("doc_id"), weights, 7L)
      .select("doc_id", "source", "slot")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val got = run(3)
    assert(got.toSeq == run(11).toSeq, "partition-invariant")
    // only weighted sources survive
    assert(got.forall(r => r._2 == "src0" || r._2 == "src1"))
    // slots unique
    assert(got.map(_._3).distinct.length == got.length)
    // re-derive expected slots from the same hash order in test code
    val hashed = docs
      .where(col("source").isin("src0", "src1"))
      .select(col("doc_id"), col("source"),
        graft.api.functions.hash64(concat(lit("7:"),
          col("doc_id").cast("string"))).as("h"))
      .as[(Long, String, Long)].collect()
    val expected = hashed.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val w = weights.toMap.apply(src)
      val cum = if (src == "src0") 0L else 2L
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case (r, k) =>
        r._1 -> ((k / w) * 3L + cum + k % w)
      }
    }.toMap
    assert(got.map(r => r._1 -> r._3).toMap == expected)
    // block composition: while both sources last, every block of 3
    // consecutive slots holds 2×src0 + 1×src1
    val bySlot = got.sortBy(_._3)
    val n1 = got.count(_._2 == "src1")
    val fullBlocks = math.min(got.count(_._2 == "src0") / 2, n1)
    (0 until fullBlocks.toInt).foreach { b =>
      val block = bySlot.filter(r => r._3 >= b * 3 && r._3 < (b + 1) * 3)
      assert(block.count(_._2 == "src0") == 2 &&
        block.count(_._2 == "src1") == 1, s"block $b: ${block.toList}")
    }
  }

  test("mixtureInterleaveTokens: per-source token fill, round budgets, " +
      "partition-invariant") {
    val weights = Seq("src0" -> 120L, "src1" -> 60L)
    def run(parts: Int) = Shards.mixtureInterleaveTokens(
        docs.repartition(parts), "source", col("doc_id"),
        graft.api.functions.token_count(col("text")), weights, 7L)
      .select("doc_id", "source", "n_tokens", "cum_tokens", "round",
        "src_order")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    val got = run(3)
    assert(got.toSeq == run(11).toSeq, "partition-invariant")
    // per-source: cum is the exact running total in seeded-hash order,
    // round = floor(start / w)
    val hashed = docs.where(col("source").isin("src0", "src1"))
      .select(col("doc_id"), col("source"),
        graft.api.functions.hash64(concat(lit("7:"),
          col("doc_id").cast("string"))).as("h"),
        graft.api.functions.token_count(col("text")).cast("long")
          .as("n"))
      .as[(Long, String, Long, Long)].collect()
    val expected = hashed.groupBy(_._2).toSeq.flatMap {
      case (src, rows) =>
        val w = weights.toMap.apply(src)
        var acc = 0L
        rows.sortBy(r => (r._3, r._1)).map { r =>
          val start = acc; acc += r._4
          r._1 -> (r._4, acc, start / w,
            if (src == "src0") 0L else 1L)
        }
    }.toMap
    assert(got.map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap ==
      expected)
    // round budget: every non-final round of a source carries >= w
    // tokens counted at starts (contiguous fill — only the straddler
    // overflows) and the start offsets of round r lie in [r*w, (r+1)*w)
    got.groupBy(_._2).foreach { case (src, rows) =>
      val w = weights.toMap.apply(src)
      rows.foreach { r =>
        val start = r._4 - r._3
        assert(r._5 == start / w, s"round rule broken for $r")
        assert(start >= r._5 * w && start < (r._5 + 1) * w)
      }
    }
  }

  test("writeShards + manifest: lossless round-trip receipts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Shards.writeShards(docs, col("doc_id"), 8, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // shard dirs on disk
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == 8)
    // manifest from the files == manifest from the in-memory assignment
    val m1 = Shards.manifest(spark, dir, "doc_id", "text").collect()
    val m2 = Shards.manifestOf(
      Shards.assignShards(docs, col("doc_id"), 8), "doc_id", "text")
      .collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    // receipts detect loss: dropping one row changes its shard's checksum
    val victim = docs.limit(1).select("doc_id").as[Long].head()
    val m3 = Shards.manifestOf(
      Shards.assignShards(docs.where(col("doc_id") =!= victim),
        col("doc_id"), 8), "doc_id", "text").collect()
    assert(m1.map(_.toSeq).toSeq != m3.map(_.toSeq).toSeq)
    // full-corpus id checksum is shard-partition independent:
    // xor of per-shard xors == xor over the whole corpus
    val whole = docs.agg(bit_xor(graft.api.functions.hash64(col("doc_id"))))
      .head().getLong(0)
    val folded = m1.map(_.getLong(3)).reduce(_ ^ _)
    assert(folded == whole)
  }

  test("single shard degenerates to a plain sorted write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard1").toString
    Shards.writeShards(docs.limit(50), col("doc_id"), 1, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 50)
    assert(back.select("shard").distinct().as[Int].collect()
      .sameElements(Array(0)))
  }
}
