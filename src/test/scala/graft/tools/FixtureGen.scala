package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): precompute golden deflate-ratio fixtures for the
  * q163 oracle.
  *
  * The q163 gate computes `deflate_ratio(text)` with the engine's codegen'd
  * expression ([[graft.expr.DeflateRatio]]). zlib DEFLATE is not expressible
  * in DuckDB SQL, so the oracle instead reads a golden per-doc ratio column
  * precomputed here — by calling `java.util.zip.Deflater` DIRECTLY with the
  * same pinned parameters (level 6, raw/nowrap, default memLevel/strategy),
  * NOT through the Catalyst expression code path. The DuckDB oracle joins
  * this fixture against `documents` and re-derives the per-source profile
  * independently, making q163 rows+schema+hash checkable.
  *
  * Usage: sbt "Test/runMain graft.tools.FixtureGen <sfDir> <outDir>"
  *   e.g. FixtureGen /root/testdata/sf0.01 dev/fixtures/deflate/sf0.01
  */
object FixtureGen {
  /** Golden recomputation: deliberately fresh Deflater per call, local
    * buffer, UTF-8 via String.getBytes — zero shared code with
    * graft.expr.DeflateKernels. */
  def goldenRatio(text: String): Double = {
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      var out = 0L
      val buf = new Array[Byte](1 << 16)
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / raw.length
    } finally d.end()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: FixtureGen <sfDir> <outDir>")
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val golden = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, goldenRatio(Option(t).getOrElse(""))) }
      .toDF("doc_id", "r")
      .orderBy("doc_id")
    golden.coalesce(1).write.mode("overwrite").parquet(outDir)
    println(s"[fixturegen] wrote ${spark.read.parquet(outDir).count()} rows to $outDir")
    spark.stop()
  }
}
