package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Sketch-driven scale operators: quantile-balanced partitioning,
  * heavy-hitter detection, salted skew joins. */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("quantileBoundaries: monotonic, balanced buckets on lineitem") {
    val li = spark.read.parquet(sf("lineitem"))
    val k = 8
    val bounds = Partitioning.quantileBoundaries(li, "l_extendedprice", k)
    assert(bounds.length == k - 1)
    assert(bounds.sliding(2).forall(p => p(0) <= p(1)), "boundaries must be sorted")
    val fracs = Partitioning.assignBuckets(li, "l_extendedprice", bounds)
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Int]("bucket") -> r.getLong(1)).toMap
    val total = fracs.values.sum.toDouble
    assert(fracs.keySet == (0 until k).toSet, s"every bucket populated: $fracs")
    fracs.values.foreach { c =>
      assert(math.abs(c / total - 1.0 / k) < 0.05, s"bucket fraction off: $fracs")
    }
  }

  test("assignBuckets: nulls and NaNs land in bucket 0; exact edges") {
    val df = Seq[java.lang.Double](null, Double.NaN, 0.0, 5.0, 10.0, 15.0)
      .toDF("v")
    val got = Partitioning.assignBuckets(df, "v", Array(5.0, 10.0))
      .select("bucket").as[Int].collect().toSeq
    // null/NaN -> 0; 0.0 -> 0; 5.0 -> 1 (>= boundary); 10.0 -> 2; 15 -> 2
    assert(got == Seq(0, 0, 0, 1, 2, 2))
  }

  test("repartitionByQuantiles: range-clustered, balanced partitions") {
    val li = spark.read.parquet(sf("lineitem"))
    val k = 4
    val parts = Partitioning.repartitionByQuantiles(li, "l_extendedprice", k)
    assert(parts.rdd.getNumPartitions == k)
    val sizes = parts.rdd.mapPartitions(it => Iterator(it.size)).collect()
    val total = sizes.sum.toDouble
    sizes.foreach(s => assert(math.abs(s / total - 1.0 / k) < 0.06,
      s"partition sizes ${sizes.toSeq}"))
    // range clustering: per-partition [min,max] of the bucket id don't overlap
    val ranges = parts.select("bucket").rdd
      .mapPartitions(it => { val s = it.map(_.getInt(0)).toSeq
        if (s.isEmpty) Iterator.empty else Iterator((s.min, s.max)) })
      .collect().sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi <= lo)
      case _ => }
  }

  test("heavyHitters: planted skew recovered with SS guarantees") {
    val rows = (1 to 5000).map(_ => 7L) ++ (1 to 2500).map(_ => 13L) ++
      (1L to 1000L)
    val df = rows.toDF("k").repartition(8)
    val hh = Skew.heavyHitters(df, "k", capacity = 64, topK = 4).collect()
    assert(hh.head.getLong(0) == 7L)
    assert(hh(1).getLong(0) == 13L)
    hh.foreach { r =>
      val (cnt, err) = (r.getLong(1), r.getLong(2))
      val actual = rows.count(_ == r.getLong(0)).toLong
      // space-saving overestimates: count − error ≤ actual ≤ count
      assert(cnt - err <= actual && actual <= cnt,
        s"SS bound violated for ${r.getLong(0)}: ${cnt - err}..$cnt vs $actual")
    }
    // string keys route through the string finisher
    val sh = Skew.heavyHitters(rows.map("k" + _).toDF("k"), "k",
      capacity = 64, topK = 2).collect()
    assert(sh.head.getString(0) == "k7")
  }

  test("saltedJoin ≡ plain join (planted skew, both key types)") {
    val left = ((1 to 3000).map(_ => (7L, "hot")) ++
      (1 to 500).map(i => (i.toLong % 50, s"v$i"))).toDF("k", "payload")
      .repartition(8)
    val right = (0L to 50L).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), countDistinct("name").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 4,
        heavy = Seq(7L))
      .groupBy("k").agg(count(lit(1)).as("n"), countDistinct("name").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    // schema contract: one key column, no salt residue
    val cols = Skew.saltedJoin(left, right, "k", 4, Seq(7L)).columns.toSeq
    assert(cols == Seq("k", "payload", "name"))
  }

  test("zvalue == reference bit interleave; range respected") {
    def ref(vals: Seq[Int], bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits; j <- vals.indices)
        z |= ((vals(j).toLong >> i) & 1L) << (i * vals.size + j)
      z
    }
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val got = rows.toDF("a", "b", "c")
      .select(Partitioning.zvalue(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((a, b, c), z) =>
      assert(z == ref(Seq(a, b, c), 8), s"($a,$b,$c)")
    }
    intercept[IllegalArgumentException] {
      Partitioning.zvalue(Seq(col("a")), 63)
    }
  }

  test("quantileBoundariesMulti == per-column boundaries, one pass") {
    val li = spark.read.parquet(sf("lineitem"))
    val multi = Partitioning.quantileBoundariesMulti(
      li, Seq("l_quantity", "l_extendedprice"), 8)
    val single1 = Partitioning.quantileBoundaries(li, "l_quantity", 8)
    val single2 = Partitioning.quantileBoundaries(li, "l_extendedprice", 8)
    assert(multi("l_quantity").toSeq == single1.toSeq)
    assert(multi("l_extendedprice").toSeq == single2.toSeq)
  }

  test("zorderBy: balanced partitions, z sorted within each, locality") {
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_quantity", "l_extendedprice", "l_orderkey")
    val k = 8
    val z = Partitioning.zorderBy(li, Seq("l_quantity", "l_extendedprice"),
      k, bits = 6)
    assert(z.rdd.getNumPartitions == k)
    assert(z.columns.contains("zvalue"))
    val perPart = z.select(spark_partition_id().as("p"), col("zvalue"))
      .groupBy("p").agg(count(lit(1)).as("n"),
        min("zvalue").as("lo"), max("zvalue").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = perPart.map(_._2).sum.toDouble
    perPart.foreach { case (p, n, _, _) =>
      assert(math.abs(n / total - 1.0 / k) < 0.08, s"partition $p unbalanced: $n")
    }
    // range-clustered: partition z-ranges must not overlap (sorted globally)
    val ranges = perPart.sortBy(_._1).map(r => (r._3, r._4)).toSeq
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ =>
    }
  }

  test("zorder layout: row-group skipping measured at the scan, vs flat layout") {
    // proof that the clustering PRUNES, not just that ranges are disjoint:
    // parquet's row-group stats filter drops whole row groups before the
    // scan emits rows, so the scan's numOutputRows (pre-Spark-filter)
    // reveals exactly how much I/O the layout saved
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_zprune").toString
    Partitioning.zorderBy(li, Seq("l_quantity", "l_extendedprice"), 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    li.repartition(16).write.mode("overwrite").parquet(s"$dir/flat")
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .where(col("l_quantity") <= lit(3.0) &&
          col("l_extendedprice") <= lit(5000.0))
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
      scan.metrics("numOutputRows").value
    }
    val total = li.count()
    val flatScanned = scanRows(s"$dir/flat")
    val zScanned = scanRows(s"$dir/z")
    // hash-partitioned layout: every row group spans the value range →
    // stats can skip nothing
    assert(flatScanned == total, s"flat layout skipped? $flatScanned/$total")
    // z-ordered: the predicate touches a corner of the (qty, price) grid —
    // most row groups must be skipped before the scan emits anything
    assert(zScanned <= total / 4,
      s"z-layout scan emitted $zScanned of $total rows — no effective pruning")
    // both layouts agree on the answer, of course
    val a = spark.read.parquet(s"$dir/z").where(col("l_quantity") <= 3.0 &&
      col("l_extendedprice") <= 5000.0).agg(sum("l_orderkey")).head().getLong(0)
    val b = spark.read.parquet(s"$dir/flat").where(col("l_quantity") <= 3.0 &&
      col("l_extendedprice") <= 5000.0).agg(sum("l_orderkey")).head().getLong(0)
    assert(a == b)
  }

  test("bloomSemiJoin: keeps all matches, prunes almost everything else") {
    val big = (0L until 20000L).map(i => (i, i % 997)).toDF("k", "v")
    val dim = (0L until 20000L by 1000L).map(i => (i, s"d$i")).toDF("dk", "name")
    val pruned = Prune.bloomSemiJoin(big, dim, "k", "dk", fpp = 0.01)
    val keys = pruned.select("k").as[Long].collect().toSet
    val want = (0L until 20000L by 1000L).toSet
    assert(want.subsetOf(keys), "bloom must never drop a true match")
    // ≤ true matches + fpp slack (3× headroom on 20k probes at 1% fpp)
    assert(keys.size <= want.size + 600, s"pruning too weak: ${keys.size}")
    // the probe is a codegen'd scan filter, not a join — checked on a
    // parquet-backed probe (a LocalRelation folds the filter at optimize
    // time and would hide the plan shape)
    val li = spark.read.parquet(sf("lineitem"))
    val plan = Prune.bloomSemiJoin(li,
        Seq(Tuple1(1L)).toDF("pk"), "l_partkey", "pk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("bloomPrunedJoin ≡ plain inner join, exactly") {
    val big = (0L until 5000L).map(i => (i, i * 3)).toDF("k", "v")
      .repartition(8)
    val dim = Seq((10L, "a"), (20L, "b"), (4999L, "c"), (123456L, "zz"))
      .toDF("dk", "name")
    val got = Prune.bloomPrunedJoin(big, dim, "k", "dk")
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = big.join(dim, col("k") === col("dk"))
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want && want.size == 3)
  }

  test("bloomOf: expectedKeys hint skips the sizing pass; KMV fallback sizes by distinct") {
    val dim = (0L until 1000L).map(i => (i % 50, s"d$i")).toDF("dk", "name")
    // count jobs triggered while building with a hint: must be exactly 1
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    def settled(): Int = {
      // listener events are async; wait for the count to go quiet
      var last = -1
      while (last != counter.get()) { last = counter.get(); Thread.sleep(150) }
      last
    }
    try {
      val bf = Prune.bloomOf(dim, "dk", fpp = 0.01, expectedKeys = 50L)
      val hintJobs = settled()
      assert((0L until 50L).forall(k => bf.mightContain(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          k, org.apache.spark.sql.types.LongType, 42L))))
      counter.set(0)
      // KMV fallback: one extra estimate pass — and sized by the 50
      // DISTINCT keys, not the 1000 rows
      val bf2 = Prune.bloomOf(dim, "dk", fpp = 0.01)
      val fallbackJobs = settled()
      assert(hintJobs < fallbackJobs,
        s"hint=$hintJobs fallback=$fallbackJobs — hint must skip the sizing pass")
      assert(bf2.bitSize() < 5000, s"bitSize ${bf2.bitSize()} — sized by rows?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloomSemiJoin drops NULL probe keys") {
    val big = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y"), (2L, "z"))
      .toDF("k", "v")
    val dim = Seq(Tuple1(1L), Tuple1(2L)).toDF("dk")
    val got = Prune.bloomSemiJoin(big, dim, "k", "dk")
      .select("v").as[String].collect().toSet
    assert(got == Set("x", "z"))
  }

  /** Sequential Gini reference: tie-averaged ranks over ascending counts. */
  private def refGini(counts: Seq[Long]): Double = {
    val n = counts.size
    val s = counts.sum
    val sorted = counts.sorted
    // average rank per value
    val byV = sorted.groupBy(identity)
    var cum = 0L
    val num = sorted.distinct.sorted.map { v =>
      val f = byV(v).size
      val r = cum + (f + 1) / 2.0
      cum += f
      v.toDouble * f * 2 * r
    }.sum
    num / (n.toDouble * s) - (n + 1).toDouble / n
  }

  test("skewMetrics matches hand counts and the sequential Gini") {
    // key a×6, b×2, c×1, d×1
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = Skew.skewMetrics(df, col("k")).head()
    assert(r.getAs[Long]("n_rows") == 10)
    assert(r.getAs[Long]("n_keys") == 4)
    assert(r.getAs[Long]("max_count") == 6)
    assert(r.getAs[Double]("avg_count") == 2.5)
    assert(r.getAs[Double]("top_share") == 0.6)
    assert(math.abs(r.getAs[Double]("gini") - refGini(Seq(6, 2, 1, 1)))
      < 1e-12)
  }

  test("skewMetrics: uniform keys → gini 0; extremes; nulls excluded; empty") {
    val uniform = (0 until 100).map(i => s"k${i % 10}").toDF("k")
    assert(math.abs(Skew.skewMetrics(uniform, col("k")).head()
      .getAs[Double]("gini")) < 1e-12)
    val onehot = (Seq.fill(99)("hot") :+ "cold").toDF("k")
    assert(Skew.skewMetrics(onehot, col("k")).head()
      .getAs[Double]("gini") > 0.45)
    val withNull = Seq(Some("a"), Some("a"), None).toDF("k")
    assert(Skew.skewMetrics(withNull, col("k")).head()
      .getAs[Long]("n_rows") == 2)
    val empty = Skew.skewMetrics(uniform.where(lit(false)), col("k")).head()
    assert(empty.getAs[Long]("n_rows") == 0 &&
      empty.getAs[Double]("gini") == 0.0)
  }

  test("heavyKeysExact: top-n by (count desc, key asc) with shares") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(5)("w") ++ Seq.fill(3)("y")
      ++ Seq("z")).toDF("k")
    val got = Skew.heavyKeysExact(df, col("k"), 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("w", 5L, 5.0 / 14), ("x", 5L, 5.0 / 14)))
  }

  test("saltedAgg == direct groupBy on a 50%-hot key, and saltCells " +
      "proves the hot key spread") {
    import spark.implicits._
    val rows = (0L until 20000L).map { i =>
      val k = if (i % 2 == 0) "hot" else s"cold${i % 257}"
      (k, i % 13, i)
    }
    val df = rows.toDF("k", "v", "id")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val salted = Skew.saltedAgg(df, col("k"), xxhash64(col("id")), 16,
        Seq(col("v") -> "sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(salted == direct)
    val cells = Skew.saltCells(df, col("k"), xxhash64(col("id")), 16)
      .collect()
    val hotCells = cells.filter(_.getString(0) == "hot")
    assert(hotCells.length == 16, "hot key must occupy all 16 salt cells")
    val maxHot = hotCells.map(_.getLong(2)).max
    assert(maxHot < 10000 / 16 * 2,
      s"heaviest hot cell $maxHot should be ~1/16 of the hot rows")
    assert(cells.map(_.getLong(2)).sum == 20000L)
  }
}
