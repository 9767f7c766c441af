package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch drive of Quality.rankBuckets (CCNet ppl bucketing) from the
  * library boundary. Temporary — delete after the run. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("verify-drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = graft.ops.LangModel.scoreSelf(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("avg_logp"), 6).as("score"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val b = graft.ops.Quality.rankBuckets(scored, col("lang"),
      -col("score"), col("doc_id"), 10, 40)
    println("== bucket sizes per language ==")
    b.groupBy("lang", "bucket").count()
      .orderBy("lang", "bucket").show(20)
    // invariants: per-lang bucket sizes match the floor cutoffs
    val chk = b.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(when(col("bucket") === "head", 1).otherwise(0)).as("h"),
      sum(when(col("bucket") === "middle", 1).otherwise(0)).as("m")).collect()
    chk.foreach { r =>
      val n = r.getLong(1)
      require(r.getLong(2) == n * 10 / 100,
        s"head size for ${r.getString(0)}")
      require(r.getLong(2) + r.getLong(3) == n * 50 / 100,
        s"head+middle size for ${r.getString(0)}")
    }
    // head scores must dominate tail scores within every language
    val agg = b.groupBy("lang").agg(
      min(when(col("bucket") === "head", col("score"))).as("worst_head"),
      max(when(col("bucket") === "tail", col("score"))).as("best_tail"))
      .collect()
    agg.foreach(r => require(r.getDouble(1) >= r.getDouble(2),
      s"head/tail inversion in ${r.getString(0)}"))
    println("VERIFY-DRIVE OK")
    spark.stop()
  }
}
