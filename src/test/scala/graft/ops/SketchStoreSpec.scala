package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.CountMin

/** Persisted CMS maintenance (SketchStore.updateCms / loadCms). */
class SketchStoreSpec extends SparkTestBase {

  test("incremental folds == one-shot sketch, byte for byte") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms_store").toString
    val path = s"$dir/cms"
    val all = (1L to 300L).map(i => i % 37)
    // three uneven shards
    val shards = Seq(all.slice(0, 50), all.slice(50, 180), all.slice(180, 300))
    var last: Array[Byte] = null
    shards.foreach { sh =>
      last = SketchStore.updateCms(spark, sh.toDF("k"), col("k"), path,
        depth = 4, width = 256)
    }
    val oneShot = all.toDF("k")
      .agg(graft.api.functions.cms_agg(col("k"), 4, 256)).collect()(0)
      .getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(last, oneShot))
    // and the STORED blob is the same state
    assert(java.util.Arrays.equals(
      SketchStore.loadCms(spark, path).get, oneShot))
    // estimates off the maintained store match exact counts (wide grid)
    (0L until 37L).foreach { k =>
      assert(CountMin.estimateFromBlob(last, k) ==
        all.count(_ == k).toLong)
    }
  }

  test("loadCms on a missing store is None, first update creates it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms_store2").toString
    val path = s"$dir/cms"
    assert(SketchStore.loadCms(spark, path).isEmpty)
    SketchStore.updateCms(spark, Seq(1L, 2L).toDF("k"), col("k"), path)
    assert(SketchStore.loadCms(spark, path).isDefined)
  }
}
