package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Temporary verify scratch: sketch aggregates as window functions. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_orderkey", "l_quantity").limit(500)
    val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = li.select(col("l_returnflag"), col("l_orderkey"),
      gf.stats_count(gf.summary_stats(col("l_quantity")).over(w)).as("running_n"),
      gf.tdigest_quantile(gf.tdigest(col("l_quantity")).over(w), 0.5).as("running_p50"),
      gf.kmv_size(gf.kmv_agg(col("l_quantity"), 1024).over(w)).as("running_distinct"))
    out.show(8, false)
    println("WINDOW OK rows=" + out.count())
    spark.stop()
  }
}
