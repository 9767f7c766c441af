package graft.core

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.api.{functions => gf}

/** Count-Min sketch: kernel laws, aggregate lifecycle, persist→merge. */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel: overestimate-only, exact for dominant keys, total") {
    val s = new CountMin(4, 1 << 14)
    val truth = scala.collection.mutable.Map.empty[Long, Long]
    (0 until 100000).foreach { i =>
      val k = (i % 317).toLong
      s.add(k); truth(k) = truth.getOrElse(k, 0L) + 1
    }
    assert(s.total == 100000L)
    truth.foreach { case (k, t) =>
      assert(s.estimate(k) >= t, s"underestimate at $k")
      // 317 keys in 16384 buckets x 4 rows: collisions are possible but an
      // estimate can exceed truth by at most the colliding keys' mass
      assert(s.estimate(k) <= t + 2000, s"wild overestimate at $k")
    }
    assert(s.estimate(999999L) <= 2000) // absent key ≈ collision noise only
  }

  test("kernel: merge == single-pass build; serde round-trips") {
    val a = new CountMin(4, 1024); val b = new CountMin(4, 1024)
    val c = new CountMin(4, 1024)
    (0L until 5000L).foreach { i =>
      val k = i % 97
      if (i % 2 == 0) a.add(k) else b.add(k)
      c.add(k)
    }
    a.merge(b)
    assert(a.counts.toSeq == c.counts.toSeq && a.total == c.total)
    val rt = CountMin.deserialize(a.serialize())
    assert(rt.counts.toSeq == a.counts.toSeq && rt.total == a.total
      && rt.depth == 4 && rt.width == 1024)
    // dimension mismatch is an error, not silent corruption
    intercept[IllegalArgumentException] {
      a.merge(new CountMin(4, 2048))
    }
  }

  test("aggregate: estimates >= exact group counts; persist -> merge reagg") {
    val li = spark.read.parquet(sf("lineitem"))
    val cms = li.agg(gf.cms_agg(col("l_partkey"), 4, 4096).as("c"))
    val exact = li.groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ests = cms.select(explode(typedLit(exact.keys.toSeq.sorted)).as("k"), col("c"))
      .select(col("k"), gf.cms_count(col("c"), col("k")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, t) => assert(ests(k) >= t, s"under at $k") }
    // split-and-remerge equals the one-shot sketch byte-for-byte
    val dir = java.nio.file.Files.createTempDirectory("cms_spec").toString
    li.withColumn("half", col("l_orderkey") % 2)
      .groupBy("half").agg(gf.cms_agg(col("l_partkey"), 4, 4096).as("c"))
      .write.mode("overwrite").parquet(dir)
    val remerged = spark.read.parquet(dir)
      .agg(gf.cms_merge_agg(col("c")).as("c")).head.getAs[Array[Byte]](0)
    val oneShot = cms.head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(remerged, oneShot))
  }

  test("SQL surface: cms_agg/cms_count/cms_total round-trip") {
    spark.read.parquet(sf("lineitem")).createOrReplaceTempView("li_cms")
    val r = spark.sql(
      """SELECT cms_count(c, 1L) e1, cms_total(c) n FROM
         (SELECT cms_agg(l_partkey, 4, 4096) c FROM li_cms)""").head
    val exact1 = spark.sql(
      "SELECT count(*) FROM li_cms WHERE l_partkey = 1").head.getLong(0)
    assert(r.getLong(0) >= exact1)
    assert(r.getLong(1) == spark.table("li_cms").count())
  }

  test("blob probe == grid estimate for every key arm; codegen'd plan") {
    // estimateFromBlob reads depth longs at offsets; must agree with the
    // materialized grid bit-for-bit on every key arm
    val grid = new CountMin(4, 1024)
    val keys = Seq(0L, 1L, -1L, Long.MinValue, 42L, 9999L)
    keys.foreach(k => (0 until 3).foreach(_ => grid.add(k)))
    val blob = grid.serialize()
    keys.foreach { k =>
      assert(CountMin.estimateFromBlob(blob, k) == grid.estimate(k), s"key $k")
    }
    assert(CountMin.totalFromBlob(blob) == grid.total)
    // corrupt blobs fail fast, not garbage
    intercept[IllegalArgumentException] {
      CountMin.estimateFromBlob(blob.take(10), 1L)
    }
    intercept[IllegalArgumentException] {
      val bad = blob.clone(); bad(0) = 0x00; CountMin.totalFromBlob(bad)
    }
    // probe stage stays inside whole-stage codegen (no CodegenFallback)
    val df = Seq(1L, 2L, 3L).toDF("k")
      .agg(gf.cms_agg(col("k"), 4, 1024).as("c"))
      .select(gf.cms_count(col("c"), lit(1L)).as("e"), gf.cms_total(col("c")).as("n"))
    df.collect()
    // the "*(n)" prefix on the probing Project marks a WholeStageCodegen
    // span — a CodegenFallback expression would strip it
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[cms_count""".r.findFirstIn(plan).isDefined,
      s"cms probe must sit inside a codegen stage:\n$plan")
  }

  test("string keys byte-hash (no numeric-cast collisions)") {
    val s = Seq("1", "01", "a", "b", "a").toDF("k")
      .agg(gf.cms_agg(col("k"), 4, 1024).as("c"))
    val got = s.select(
      gf.cms_count(col("c"), lit("1")), gf.cms_count(col("c"), lit("01")),
      gf.cms_count(col("c"), lit("a")), gf.cms_count(col("c"), lit("zz"))).head
    assert(got.getLong(0) == 1 && got.getLong(1) == 1 && got.getLong(2) == 2)
    assert(got.getLong(3) <= 1) // absent; tiny grid may collide once
  }
}
