package graft.ops

import graft.SparkTestBase
import graft.api.{functions => gf}
import org.apache.spark.sql.functions._

/** Distributed prefix sum + sequence packing vs brute force. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("withPrefixSum == brute-force cumsum; partitioning-invariant; no global window") {
    val rows = (0L until 5000L).map(i => (i, (i * 37 % 91 + 1).toDouble))
    val df = rows.toDF("k", "v")
    val want = rows.sortBy(_._1).scanLeft((-1L, 0.0)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.drop(1).toMap
    for (reparted <- Seq(df, df.repartition(13), df.orderBy(desc("k")))) {
      val got = Packing.withPrefixSum(reparted, "k", "v", "cum", buckets = 8)
        .select("k", "cum").collect().map(r => r.getLong(0) -> r.getDouble(1))
        .toMap
      assert(got == want)
    }
    // the scan must NOT be a single global-partition window: the window
    // partitions by the quantile bucket
    val plan = Packing.withPrefixSum(df, "k", "v", "cum", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), plan)
  }

  test("withPrefixSumLong: LONG-exact cumsum, partitioning-invariant, bucketed plan") {
    // values near 2^53 where the DOUBLE variant would lose exactness:
    // the long path must stay bit-exact
    val big = (1L << 52)
    val rows = (0L until 200L).map(i => (i, big + i * 37L % 91L + 1L))
    val df = rows.toDF("k", "v")
    val want = rows.sortBy(_._1).scanLeft((-1L, 0L)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.drop(1).toMap
    for (reparted <- Seq(df, df.repartition(7), df.orderBy(desc("k")))) {
      val got = Packing
        .withPrefixSumLong(reparted, "k", "v", "cum", buckets = 8)
        .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want)
    }
    val plan = Packing.withPrefixSumLong(df, "k", "v", "cum", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), plan)
  }

  test("withPrefixSumDec: bit-identical to a sequential decimal cumsum " +
      "at any parallelism (the double variant's ulp drift is gone)") {
    // irrational-ish terms where double regrouping WOULD drift
    val rows = (0 until 300).map(i =>
      (i.toDouble, math.log((i % 37 + 2).toDouble / (i % 37 + 3))))
    val df = rows.toDF("k", "v")
    val want = {
      var acc = java.math.BigDecimal.ZERO
      rows.map { case (k, v) =>
        // Spark's double->decimal cast parses Double.toString (the
        // shortest round-trip repr), not the exact binary expansion
        acc = acc.add(java.math.BigDecimal.valueOf(v)
          .setScale(18, java.math.RoundingMode.HALF_UP))
        k -> acc
      }.toMap
    }
    for (reparted <- Seq(df, df.repartition(7), df.orderBy(desc("k")))) {
      val got = Packing.withPrefixSumDec(reparted, Seq("k"), "v", "cum")
        .select("k", "cum").collect()
        .map(r => r.getDouble(0) -> r.getDecimal(1)).toMap
      got.foreach { case (k, d) =>
        assert(d.compareTo(want(k)) == 0, s"k=$k")
      }
    }
  }

  test("withSuffixMinDouble == sequential suffix min at any " +
      "parallelism; NULL values skipped") {
    val rows = (0 until 300).map(i =>
      (i.toDouble, ((i * 29) % 97).toDouble))
    val df = rows.toDF("k", "v")
    val want = rows.sortBy(-_._1).scanLeft((0.0, Double.MaxValue)) {
      case ((_, m), (k, v)) => (k, math.min(m, v))
    }.drop(1).toMap
    for (reparted <- Seq(df, df.repartition(7), df.orderBy(desc("k")))) {
      val got = Packing.withSuffixMinDouble(reparted, Seq("k"), "v", "sm")
        .select("k", "sm").collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      got.foreach { case (k, m) => assert(m == want(k), s"k=$k") }
    }
  }

  test("groupedPrefixSumDec: per-group exact decimal cumsum, " +
      "partition-invariant") {
    val rows = (0 until 200).map(i => ("g" + i % 3, i.toDouble,
      math.log((i % 13 + 2).toDouble / (i % 13 + 3))))
    val df = rows.toDF("g", "k", "v")
    val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
      var acc = java.math.BigDecimal.ZERO
      xs.sortBy(_._2).map { case (_, k, v) =>
        acc = acc.add(java.math.BigDecimal.valueOf(v)
          .setScale(18, java.math.RoundingMode.HALF_UP))
        (g, k) -> acc
      }
    }
    for (parts <- Seq(1, 7)) {
      val got = Packing.groupedPrefixSumDec(df.repartition(parts),
          col("g"), col("k"), lit(0L), col("v"), "cum")
        .select("g", "k", "cum").collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDecimal(2))
        .toMap
      want.foreach { case (key, w) =>
        assert(got(key).compareTo(w) == 0, s"key=$key parts=$parts")
      }
    }
  }

  test("groupedPrefixSumsDec: three-column grouped cumsum equals three " +
      "single-column passes, partition-invariant") {
    val rows = (0 until 200).map(i => ("g" + i % 3, i.toDouble,
      math.log((i % 13 + 2).toDouble / (i % 13 + 3)),
      math.exp(-(i % 7).toDouble), (i % 5).toDouble / 8))
    val df = rows.toDF("g", "k", "v0", "v1", "v2")
    val singles = Seq("v0", "v1", "v2").map { v =>
      v -> Packing.groupedPrefixSumDec(df, col("g"), col("k"), lit(0L),
          col(v), "cum")
        .select("g", "k", "cum").collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDecimal(2))
        .toMap
    }.toMap
    for (parts <- Seq(1, 7)) {
      val got = Packing.groupedPrefixSumsDec(df.repartition(parts),
          col("g"), col("k"), lit(0L),
          Seq("v0" -> "c0", "v1" -> "c1", "v2" -> "c2"))
        .select("g", "k", "c0", "c1", "c2").collect()
      got.foreach { r =>
        val key = (r.getString(0), r.getDouble(1))
        Seq(("v0", 2), ("v1", 3), ("v2", 4)).foreach { case (v, i) =>
          assert(r.getDecimal(i).compareTo(singles(v)(key)) == 0,
            s"key=$key col=$v parts=$parts")
        }
      }
    }
  }

  test("bucket auto-sizing: tiny inputs collapse to 2 buckets, exact anyway") {
    // the cap itself
    assert(Packing.effectiveBuckets(200, 7L) == 2)
    assert(Packing.effectiveBuckets(200, 31L) == 2)
    assert(Packing.effectiveBuckets(200, 320L) == 20)
    assert(Packing.effectiveBuckets(8, 1000000L) == 8)
    // a 7-row frame with a huge requested bucket count: still exact
    val rows = Seq((1L, 2.0), (2L, 5.0), (3L, 1.0), (4L, 4.0), (5L, 3.0),
      (6L, 7.0), (7L, 6.0))
    val got = Packing.withPrefixSum(rows.toDF("k", "v"), "k", "v", "cum",
        buckets = 200)
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val want = rows.scanLeft((0L, 0.0)) { case ((_, a), (k, v)) => (k, a + v) }
      .drop(1).toMap
    assert(got == want)
  }

  test("packByTokenBudget: deterministic contiguous fill, offsets within budget") {
    val docs = (0L until 2000L).map(i => (i, (i * 13 % 200 + 1).toInt))
    val df = docs.toDF("doc_id", "n_tok")
    val budget = 1000L
    val got = Packing.packByTokenBudget(df, "doc_id", "n_tok", budget,
        buckets = 8)
      .select("doc_id", "n_tok", "bin", "bin_offset").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // brute force: contiguous fill by cumsum-before
    var acc = 0L
    val want = docs.sortBy(_._1).map { case (id, tok) =>
      val before = acc; acc += tok
      (id, tok, before / budget, before - before / budget * budget)
    }
    assert(got.toSeq == want)
    // offsets always inside the budget window
    assert(got.forall(r => r._4 >= 0 && r._4 < budget))
    // bins are contiguous and monotone in doc order
    val bins = got.map(_._3)
    assert(bins.toSet == (bins.min to bins.max).toSet)
    assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
    // contiguous fill: every non-final bin holds ≥ budget − maxDocLen
    // tokens (its span is a full budget window minus straddler overflow)
    val maxDoc = docs.map(_._2.toLong).max
    val binTotals = got.groupBy(_._3).map { case (b, rs) => b -> rs.map(_._2.toLong).sum }
    (bins.min until bins.max).foreach { b =>
      assert(binTotals(b) >= budget - maxDoc, s"bin $b starved: ${binTotals(b)}")
    }
  }

  test("packingStats: hand-computed receipt incl. straddler and naive baseline") {
    import spark.implicits._
    // budget 10, doc order 1..4 with tokens 6,6,9,2:
    // before = 0,6,12,21 → bins 0,0,1,2. bin0 = {6,6}=12 (straddler
    // overflow), bin1 = {9}, bin2 = {2} → 3 bins.
    // naive = ceil(6/10)+ceil(6/10)+ceil(9/10)+ceil(2/10) = 4 → gain 4/3
    val df = Seq((1L, 6L), (2L, 6L), (3L, 9L), (4L, 2L)).toDF("id", "tok")
    val r = Packing.packingStats(df, "id", "tok", 10L).head()
    assert(r.getAs[Long]("n_bins") == 3)
    assert(r.getAs[Long]("n_docs") == 4)
    assert(r.getAs[Long]("total_tokens") == 23)
    assert(r.getAs[Long]("max_bin_tokens") == 12)
    assert(r.getAs[Long]("n_overflow_bins") == 1)
    assert(r.getAs[Long]("naive_seqs") == 4)
    assert(math.abs(r.getAs[Double]("avg_fill") -
      ((1.2 + 0.9 + 0.2) / 3)) < 1e-6)
    assert(math.abs(r.getAs[Double]("packing_gain") - 4.0 / 3) < 1e-6)
  }

  test("packing works end-to-end on the documents fixture") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), gf.token_count(col("text")).as("n_tok"))
    val packed = Packing.packByTokenBudget(docs, "doc_id", "n_tok", 4096L)
    val total = docs.agg(sum(col("n_tok").cast("long"))).head().getLong(0)
    val nBins = packed.agg(countDistinct("bin")).head().getLong(0)
    assert(nBins == total / 4096 + (if (total % 4096 > 0) 1 else 0) ||
      nBins == math.max(1, total / 4096), s"bins $nBins for $total tokens")
    assert(packed.count() == docs.count())
  }

  test("truncationStats: hand-computed sweep, groups, nulls, edge lengths") {
    import spark.implicits._
    // lengths 10, 20, 30 in group a; 5 in group b; one NULL excluded
    val df = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)),
      ("b", Some(5L)), ("b", None)).toDF("g", "t")
    val out = Packing.truncationStats(df, col("t"), Seq(15, 25), Seq("g"))
      .orderBy("g", "max_len").collect()
    assert(out.length == 4)
    // a @15: trunc 2 (20, 30), kept 10+15+15 = 40 of 60
    val a15 = out(0)
    assert(a15.getString(0) == "a" && a15.getInt(1) == 15)
    assert(a15.getLong(2) == 3L && a15.getLong(3) == 2L)
    assert(a15.getLong(4) == 60L && a15.getLong(5) == 40L)
    assert(math.abs(a15.getDouble(6) - 20.0 / 60) < 1e-15)
    assert(math.abs(a15.getDouble(7) - 2.0 / 3) < 1e-15)
    // a @25: trunc 1 (30), kept 10+20+25 = 55
    assert(out(1).getLong(5) == 55L)
    // b: never truncated at either length; NULL row excluded from n_docs
    assert(out(2).getLong(2) == 1L && out(2).getLong(3) == 0L &&
      out(2).getDouble(6) == 0.0)
    // ungrouped = one row per candidate length over everything
    val flat = Packing.truncationStats(df, col("t"), Seq(15))
      .collect()
    assert(flat.length == 1 && flat(0).getLong(1) == 4L &&
      flat(0).getLong(4) == 45L) // 10 + 15 + 15 + 5 kept at max_len 15
  }

  test("concatChunk: hand-computed samples, eos separators, final pad") {
    // docs (in id order): [10,11] [20] [30,31,32,33] → with eos=2:
    // stream = 10 11 2 | 20 2 | 30 31 32 33 2  (11 tokens), L=4 →
    // s0=[10,11,2,20] s1=[2,30,31,32] s2=[33,2,0,0] (pad=0)
    val enc = Seq((1L, Seq(10L, 11L)), (2L, Seq(20L)),
      (3L, Seq(30L, 31L, 32L, 33L))).toDF("doc_id", "ids")
    val got = graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
      seqLen = 4, eosId = 2L, padId = 0L)
      .orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .toList
    assert(got == List(
      (0L, List(10L, 11L, 2L, 20L), 0L),
      (1L, List(2L, 30L, 31L, 32L), 0L),
      (2L, List(33L, 2L, 0L, 0L), 2L)))
    // dropRemainder: the partial sample disappears
    val dropped = graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
      seqLen = 4, eosId = 2L, dropRemainder = true)
      .orderBy("sample_id").collect().map(_.getLong(0)).toList
    assert(dropped == List(0L, 1L))
  }

  test("concatChunk boundaries: doc starts by hand, straddler has none") {
    // stream (L=4, 12 tokens): d1=[10,11,2]@0  d2=[20,2]@3
    // d3=[30,31,32,33,34,35,2]@5 — s0: d1@0, d2@3; s1: d3@pos1 (global
    // 5); s2: d3 continues through the whole sample — NO start
    val enc = Seq((1L, Seq(10L, 11L)), (2L, Seq(20L)),
      (3L, Seq(30L, 31L, 32L, 33L, 34L, 35L))).toDF("doc_id", "ids")
    val got = graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
      seqLen = 4, eosId = 2L, padId = 0L, boundaries = true)
      .orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2).toList)).toList
    assert(got == List(
      (0L, List(0L, 3L)),
      (1L, List(1L)),
      (2L, List.empty[Long])))
    // doc_starts column absent unless requested
    assert(!graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
      seqLen = 4, eosId = 2L).columns.contains("doc_starts"))
  }

  test("concatChunk: empty/null id arrays contribute their eos only") {
    val enc = Seq((1L, Seq.empty[Long]), (2L, Seq(7L)))
      .toDF("doc_id", "ids")
      .union(Seq(3L).toDF("doc_id").select(col("doc_id"),
        lit(null).cast("array<long>").as("ids")))
    val got = graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
      seqLen = 4, eosId = 9L, padId = 0L)
      .orderBy("sample_id").collect()
      .map(r => r.getSeq[Long](1).toList).toList
    // stream = 9 | 7 9 | 9 → one sample [9,7,9,9]
    assert(got == List(List(9L, 7L, 9L, 9L)))
  }

  test("concatChunkMasked: lockstep masks, no separator, pad=(padId,0)") {
    // pre-framed conversations (bos=1 eos=2 already inside): streams
    // concatenate WITHOUT injected separators —
    // c1 = [1,10,11,2]/[0,1,1,0]  c2 = [1,20,2]/[0,0,0]
    // c3 = [1,30,31,2]/[0,1,0,1] → 11 tokens, L=4:
    // s0 = [1,10,11,2]/[0,1,1,0]  s1 = [1,20,2,1]/[0,0,0,0]
    // s2 = [30,31,2,0]/[1,0,1,0] (pad 1)
    val enc = Seq(
      (1L, Seq(1L, 10L, 11L, 2L), Seq(0, 1, 1, 0)),
      (2L, Seq(1L, 20L, 2L), Seq(0, 0, 0)),
      (3L, Seq(1L, 30L, 31L, 2L), Seq(0, 1, 0, 1)))
      .toDF("conv", "ids", "mask")
    val got = graft.ops.Packing.concatChunkMasked(enc, "conv", "ids",
        "mask", seqLen = 4, padId = 0L)
      .orderBy("sample_id").collect()
      .map(r => (r.getAs[Long]("sample_id"),
        r.getAs[scala.collection.Seq[Long]]("ids").toList,
        r.getAs[scala.collection.Seq[Int]]("mask").toList,
        r.getAs[Long]("n_pad"))).toList
    assert(got == List(
      (0L, List(1L, 10L, 11L, 2L), List(0, 1, 1, 0), 0L),
      (1L, List(1L, 20L, 2L, 1L), List(0, 0, 0, 0), 0L),
      (2L, List(30L, 31L, 2L, 0L), List(1, 0, 1, 0), 1L)))
    // boundaries ride through: conv starts at s0@0, s1@0, s1@1(global 4
    // is c2? c1 ends at 4 → c2 starts global 4 = s1@0, c3 at 7 = s1@3)
    val b = graft.ops.Packing.concatChunkMasked(enc, "conv", "ids",
        "mask", seqLen = 4, boundaries = true)
      .orderBy("sample_id").collect()
      .map(r => r.getAs[scala.collection.Seq[Long]]("doc_starts").toList)
      .toList
    assert(b == List(List(0L), List(0L, 3L), List.empty[Long]))
    // an empty conversation contributes nothing (and must not build a
    // descending covering-sample range)
    val withEmpty = enc.union(Seq((4L, Seq.empty[Long], Seq.empty[Int]))
      .toDF("conv", "ids", "mask"))
    val got2 = graft.ops.Packing.concatChunkMasked(withEmpty, "conv",
        "ids", "mask", seqLen = 4).orderBy("sample_id").collect()
      .map(r => r.getAs[scala.collection.Seq[Long]]("ids").toList).toList
    assert(got2 == got.map(_._2))
  }

  test("chunkProvenance appendSep=false: spans match the masked packer") {
    // same pre-framed streams as the masked test: c1@[0,4) c2@[4,7)
    // c3@[7,11), L=4 → c1 spans s0 only, c2 spans s1, c3 spans s1..s2
    val enc = Seq(
      (1L, Seq(1L, 10L, 11L, 2L)),
      (2L, Seq(1L, 20L, 2L)),
      (3L, Seq(1L, 30L, 31L, 2L)),
      (4L, Seq.empty[Long]))
      .toDF("conv", "ids")
    val got = graft.ops.Packing.chunkProvenance(enc, "conv", "ids",
        seqLen = 4, eosId = 0L, appendSep = false)
      .orderBy("conv", "sample_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 0L, 4L), (2L, 1L, 3L), (3L, 1L, 1L),
      (3L, 2L, 3L)))
    // token conservation vs the masked packer's real token count
    val real = graft.ops.Packing.concatChunkMasked(
        enc.withColumn("mask", transform(col("ids"), _ => lit(0))),
        "conv", "ids", "mask", seqLen = 4)
      .agg(sum(lit(4L) - col("n_pad"))).head().getLong(0)
    assert(got.map(_._3).sum == real)
  }

  test("positionIds: reset at doc starts, straddler restarts at 0") {
    val got = Seq((Seq(0L, 3L), 0), (Seq(1L), 1), (Seq.empty[Long], 2))
      .toDF("doc_starts", "k")
      .orderBy("k")
      .select(graft.ops.Packing.positionIds(col("doc_starts"), 6).as("p"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(got == List(
      List(0L, 1L, 2L, 0L, 1L, 2L), // docs at 0 and 3
      List(0L, 0L, 1L, 2L, 3L, 4L), // carry-over token, then doc at 1
      List(0L, 1L, 2L, 3L, 4L, 5L))) // whole sample inside a straddler
  }

  test("chunkProvenance: overlaps by hand; agrees with concatChunk") {
    // stream (L=4, 12 tokens): d1@0 len3, d2@3 len2, d3@5 len7
    val enc = Seq((1L, Seq(10L, 11L)), (2L, Seq(20L)),
      (3L, Seq(30L, 31L, 32L, 33L, 34L, 35L))).toDF("doc_id", "ids")
    val got = graft.ops.Packing.chunkProvenance(enc, "doc_id", "ids",
        seqLen = 4, eosId = 2L)
      .orderBy("doc_id", "sample_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      (1L, 0L, 3L),              // d1 entirely in s0
      (2L, 0L, 1L), (2L, 1L, 1L), // d2 straddles s0/s1
      (3L, 1L, 3L), (3L, 2L, 4L))) // d3 spans s1..s2
    // token conservation + membership agreement with the packer's
    // boundary view on a random corpus
    val rnd = new scala.util.Random(7341)
    val big = (0L until 150L).map(i =>
      (i, Seq.fill(rnd.nextInt(25))(rnd.nextLong(500) + 10)))
      .toDF("doc_id", "ids")
    val prov = graft.ops.Packing.chunkProvenance(big, "doc_id", "ids",
      seqLen = 32, eosId = 2L)
    val cons = prov.groupBy("doc_id").agg(sum("n_tokens").as("s"))
      .join(big.select(col("doc_id"),
        (size(col("ids")) + 1).cast("long").as("n")), Seq("doc_id"))
      .filter(col("s") =!= col("n")).count()
    assert(cons == 0L, "every doc's overlaps must sum to its stream len")
    val perSample = prov.groupBy("sample_id")
      .agg(sum("n_tokens").as("s")).orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    val packed = graft.ops.Packing.concatChunk(big, "doc_id", "ids",
        seqLen = 32, eosId = 2L, padId = 0L)
      .select(col("sample_id"), (lit(32L) - col("n_pad")).as("s"))
      .orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(perSample == packed,
      "per-sample overlap totals must equal the packer's real-token counts")
  }

  test("chunkBatchWithCarry folded over batches ≡ one-shot concatChunk") {
    val rnd = new scala.util.Random(4242)
    val rows = (0L until 120L).map(i =>
      (i, Seq.fill(rnd.nextInt(30))(rnd.nextLong(1000) + 10)))
    val enc = rows.toDF("doc_id", "ids")
    val oneShot = graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
      seqLen = 32, eosId = 2L, padId = 0L)
      .orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .toList
    // 5 uneven doc-ordered batches (incl. an EMPTY one)
    val cuts = Seq((0L, 13L), (13L, 13L), (13L, 57L), (57L, 120L))
    var carry = graft.ops.Packing.ChunkCarry(Nil, 0L)
    val emitted = scala.collection.mutable.ListBuffer
      .empty[(Long, List[Long], Long)]
    cuts.foreach { case (lo, hi) =>
      val (full, next) = graft.ops.Packing.chunkBatchWithCarry(
        enc.where(col("doc_id") >= lo && col("doc_id") < hi),
        "doc_id", "ids", seqLen = 32, eosId = 2L, carry)
      emitted ++= full.orderBy("sample_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList, 0L))
      carry = next
    }
    graft.ops.Packing.flushCarry(carry, 32, padId = 0L).foreach {
      case (sid, ids, nPad) => emitted += ((sid, ids.toList, nPad))
    }
    assert(emitted.toList == oneShot,
      "streamed fold must equal the one-shot chunker exactly")
  }

  test("streaming masked chunking: carry fold over bit-packed pairs " +
      "≡ one-shot concatChunkMasked") {
    // the streaming-SFT composition: pack mask into the id's low bit,
    // fold chunkBatchWithCarry(appendSep=false) over doc-ordered
    // batches, unpack — must equal the one-shot masked packer exactly
    val rnd = new scala.util.Random(97)
    val rows = (0L until 60L).map { i =>
      val n = rnd.nextInt(20)
      (i, 1L +: Seq.fill(n)(rnd.nextLong(500) + 8) :+ 2L,
        0 +: Seq.fill(n)(rnd.nextInt(2)) :+ 0)
    }
    val enc = rows.toDF("conv", "ids", "mask")
    val oneShot = graft.ops.Packing.concatChunkMasked(enc, "conv",
        "ids", "mask", seqLen = 16, padId = 0L)
      .orderBy("sample_id").collect()
      .map(r => (r.getAs[Long]("sample_id"),
        r.getAs[scala.collection.Seq[Long]]("ids").toList,
        r.getAs[scala.collection.Seq[Int]]("mask").toList,
        r.getAs[Long]("n_pad"))).toList
    val packed = enc.select(col("conv"), zip_with(col("ids"),
      col("mask"), (i, m) => i * 2L + m.cast("long")).as("pk"))
    val cuts = Seq((0L, 7L), (7L, 7L), (7L, 31L), (31L, 60L))
    var carry = graft.ops.Packing.ChunkCarry(Nil, 0L)
    val emitted = scala.collection.mutable.ListBuffer
      .empty[(Long, List[Long], List[Int], Long)]
    cuts.foreach { case (lo, hi) =>
      val (full, next) = graft.ops.Packing.chunkBatchWithCarry(
        packed.where(col("conv") >= lo && col("conv") < hi),
        "conv", "pk", seqLen = 16, eosId = 0L, carry, appendSep = false)
      emitted ++= full.orderBy("sample_id").collect().map { r =>
        val pk = r.getSeq[Long](1)
        (r.getLong(0), pk.map(_ / 2).toList, pk.map(x => (x % 2).toInt)
          .toList, 0L)
      }
      carry = next
    }
    graft.ops.Packing.flushCarry(carry, 16, padId = 0L).foreach {
      case (sid, pk, nPad) =>
        emitted += ((sid, pk.map(_ / 2).toList,
          pk.map(x => (x % 2).toInt).toList, nPad))
    }
    assert(emitted.toList == oneShot,
      "streamed masked fold must equal the one-shot masked packer")
  }

  test("carry persistence: save/load mid-stream, resumed fold unchanged") {
    val rnd = new scala.util.Random(515)
    val enc = (0L until 80L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(20))(rnd.nextLong(900) + 10)))
      .toDF("doc_id", "ids")
    val oneShot = graft.ops.Packing.concatChunk(enc, "doc_id", "ids",
        seqLen = 24, eosId = 2L, padId = 0L)
      .orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toList
    // first half, then a save/load "restart", then the second half
    val (a, c1) = graft.ops.Packing.chunkBatchWithCarry(
      enc.where(col("doc_id") < 40), "doc_id", "ids", 24, 2L,
      graft.ops.Packing.ChunkCarry(Nil, 0L))
    val dir = java.nio.file.Files.createTempDirectory("carrystore")
      .toString
    graft.ops.Packing.saveCarry(spark, dir, c1, batchId = 7L)
    val (resumed, lastBatch) = graft.ops.Packing.loadCarry(spark, dir)
    assert(resumed == c1 && lastBatch == 7L)
    val (b, c2) = graft.ops.Packing.chunkBatchWithCarry(
      enc.where(col("doc_id") >= 40), "doc_id", "ids", 24, 2L, resumed)
    val folded =
      (a.collect() ++ b.collect())
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList))
        .sortBy(_._1).toList ++
        graft.ops.Packing.flushCarry(c2, 24, 0L)
          .map { case (sid, ids, _) => (sid, ids.toList) }.toList
    assert(folded == oneShot)
  }

  test("concatChunk: partitioning-invariant, samples straddle docs") {
    val rnd = new scala.util.Random(99)
    val enc = (0L until 300L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong(1000) + 10)))
      .toDF("doc_id", "ids")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Packing.concatChunk(df, "doc_id", "ids", seqLen = 128,
        eosId = 2L, padId = 0L)
        .orderBy("sample_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toList
    val a = run(enc)
    val b = run(enc.repartition(13))
    assert(a == b, "chunking must be independent of partitioning")
    // total token conservation: all samples are exactly L, pads only in
    // the last one
    val total = enc.select(sum(size(col("ids")))).collect()(0).getLong(0) +
      300L // one eos per doc
    val nSamples = a.size.toLong
    assert(a.forall(_._2.size == 128))
    assert(nSamples == (total + 127L) / 128L)
  }

  test("prefixCacheStats buckets by the exact prefix slice") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L, 4L, 5L), Seq(1L, 2L, 3L, 4L, 9L),
      Seq(1L, 2L, 3L, 4L), Seq(7L, 8L))
      .toDF("ids")
    val got = Packing.prefixCacheStats(df, col("ids"), 4)
      .collect().map(r => r.getSeq[Long](0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // three requests share the [1,2,3,4] prefix: 2 of 3 prefills saved
    assert(got(Seq(1L, 2L, 3L, 4L)) == (4L, 3L, 14L, 8L))
    // a short sequence buckets by its whole id list and saves nothing
    assert(got(Seq(7L, 8L)) == (2L, 1L, 2L, 0L))
  }

  test("kvPageStats: ceil pages, last-page fragmentation") {
    import spark.implicits._
    // lens 1, 16, 17 at page 16 -> pages 1, 1, 2; frag 15, 0, 15
    val df = Seq(("g", 1L), ("g", 16L), ("g", 17L)).toDF("grp", "len")
    val r = Packing.kvPageStats(df, Seq("grp"), col("len"), 16)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_seqs")) == 3L)
    assert(r.getLong(r.fieldIndex("total_tokens")) == 34L)
    assert(r.getLong(r.fieldIndex("total_pages")) == 4L)
    assert(r.getLong(r.fieldIndex("frag_tokens")) == 30L)
    assert(r.getDouble(r.fieldIndex("util")) == 34.0 / 64.0)
  }

  test("padBuckets: equal-count length bins, exact waste") {
    import spark.implicits._
    // lengths 1..8 into 2 buckets: {1..4} pads to 4, {5..8} pads to 8
    val df = (1L to 8L).map(i => (i, 100L + i)).toDF("len", "id")
    val got = Packing.padBuckets(df, col("len"), col("id"), 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got(0L) == (4L, 1L, 4L, 10L, 6L))
    assert(got(1L) == (4L, 5L, 8L, 26L, 6L))
    // one bucket = pad everything to the global max
    val one = Packing.padBuckets(df, col("len"), col("id"), 1)
      .collect()(0)
    assert(one.getLong(5) == 8L * 8L - 36L)
    // partitioning-invariant
    val again = Packing.padBuckets(df.repartition(5), col("len"),
      col("id"), 2).orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(again == got.toSeq.sortBy(_._1).map { case (b, t) =>
      Seq(b, t._1, t._2, t._3, t._4, t._5) })
  }

  test("withPrefixSumsLong: multi-column cums + literal totals + cross-" +
      "partition lead equal the single-window truth at any parallelism") {
    val rows = (0L until 3000L).map { i =>
      // unique by construction (distinct longs < 2^53, /7 injective)
      val v = ((i * 2654435761L % 100003L) * 3000 + i).toDouble / 7.0
      (v, i % 7 + 1, i % 3)
    }
    val df = rows.toDF("v", "da", "db")
    val sorted = rows.sortBy(_._1)
    var ca = 0L; var cb = 0L
    val want = sorted.map { case (v, da, db) =>
      ca += da; cb += db
      (v, ca, cb)
    }
    val ta = rows.map(_._2).sum
    val tb = rows.map(_._3).sum
    val nexts = sorted.map(_._1).drop(1).map(Option(_)) :+ None
    val wantLead = sorted.map(_._1).zip(nexts).toMap
    for (parts <- Seq("2", "4", "13")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val got = Packing.withPrefixSumsLong(df, Seq("v"),
            sums = Seq("da" -> "ca", "db" -> "cb"),
            totals = Seq("da" -> "na", "db" -> "nb"),
            leadOut = Some("nextv"))
          .orderBy("v")
          .select("v", "ca", "cb", "na", "nb", "nextv")
          .collect()
        assert(got.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
          .toSeq == want, s"cums at parts=$parts")
        assert(got.forall(r => r.getLong(3) == ta && r.getLong(4) == tb),
          s"totals at parts=$parts")
        got.foreach { r =>
          val lead = if (r.isNullAt(5)) None else Some(r.getDouble(5))
          assert(lead == wantLead(r.getDouble(0)), s"lead at parts=$parts")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("withPrefixSumsLong: empty frame and 1-row frame degenerate cleanly") {
    val empty = Seq.empty[(Double, Long)].toDF("v", "f")
    val e = Packing.withPrefixSumsLong(empty, Seq("v"),
      sums = Seq("f" -> "c"), totals = Seq("f" -> "t"),
      leadOut = Some("nx"))
    assert(e.count() == 0)
    assert(e.columns.toSet == Set("v", "f", "c", "t", "nx"))
    val one = Seq((3.5, 7L)).toDF("v", "f")
    val o = Packing.withPrefixSumsLong(one, Seq("v"),
      sums = Seq("f" -> "c"), totals = Seq("f" -> "t"),
      leadOut = Some("nx")).collect()(0)
    assert(o.getAs[Long]("c") == 7L && o.getAs[Long]("t") == 7L &&
      o.isNullAt(o.fieldIndex("nx")))
  }

  test("fillAcross forward/backward == global-window truth, including " +
      "across partition boundaries and leading/trailing nulls") {
    // interleave 400 "probe" rows (null payload) with 100 "ref" rows,
    // composite (k, ord) order, refs sparse so whole partitions can be
    // payload-free at 13 partitions
    val refs = (0 until 100).map(i => (i * 97.0, 1, Some(i * 10L)))
    val probes = (0 until 400).map(i => (i * 24.25, 0, None: Option[Long]))
    val rows = scala.util.Random.shuffle(refs ++ probes)
    val df = rows.map { case (k, o, v) => (k, o, v.map(Long.box).orNull) }
      .toDF("k", "ord", "pay").select(col("k"), col("ord"),
        col("pay").cast("long").as("pay"))
    val sorted = (refs ++ probes).sortBy(t => (t._1, t._2))
    def scanFwd = {
      var cur: Option[Long] = None
      sorted.reverse.map { case (k, o, v) =>
        if (v.isDefined) cur = v
        ((k, o), cur)
      }.reverse.toMap
    }
    def scanBack = {
      var cur: Option[Long] = None
      sorted.map { case (k, o, v) =>
        if (v.isDefined) cur = v
        ((k, o), cur)
      }.toMap
    }
    for (parts <- Seq("3", "13")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val f = Packing.fillAcross(df, Seq("k", "ord"), "pay", "out",
          forward = true).collect()
        f.foreach { r =>
          val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
          assert(got == scanFwd((r.getDouble(0), r.getInt(1))),
            s"fwd at parts=$parts k=${r.getDouble(0)}")
        }
        val b = Packing.fillAcross(df, Seq("k", "ord"), "pay", "out",
          forward = false).collect()
        b.foreach { r =>
          val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
          assert(got == scanBack((r.getDouble(0), r.getInt(1))),
            s"back at parts=$parts k=${r.getDouble(0)}")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
