package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verify drive for Pipeline.leakFreeSplit (q127). Deleted after. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

    val clean = graft.ops.Pipeline.leakFreeSplit(docs, "doc_id", "text",
      splits, shingleN = 2, threshold = 0.5)
    val got = clean.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // reference from the two public ingredients driven independently
    val assigned = graft.ops.Sampling.hashSplit(docs, col("doc_id"), splits)
    val splitOf = assigned.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val leaks = graft.ops.Pipeline.splitLeakage(assigned, "doc_id", "text",
      "split", shingleN = 2, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val wantDrop = leaks.flatMap { case (a, b, sa, sb) =>
      Seq((a, sa), (b, sb)).filter(_._2 != "train").map(_._1) }.toSet
    require(got.keySet == splitOf.keySet -- wantDrop,
      s"survivor set: ${got.size} vs ${splitOf.size - wantDrop.size}")
    got.foreach { case (id, sp) => require(splitOf(id) == sp, s"label $id") }
    val trainIn = splitOf.values.count(_ == "train")
    val trainOut = got.values.count(_ == "train")
    require(trainIn == trainOut, "training mass must be preserved")
    println(s"${splitOf.size} docs → ${got.size} after dropping ${wantDrop.size} " +
      s"non-train leak members (${leaks.length} leaking pairs); train $trainIn → $trainOut")

    // no residual leakage among survivors
    val residual = graft.ops.Pipeline.splitLeakage(clean, "doc_id", "text",
      "split", shingleN = 2, threshold = 0.5).count()
    require(residual == 0L, s"residual leakage: $residual pairs")
    println("survivor corpus has zero cross-split near-dup pairs")
    spark.stop()
  }
}
