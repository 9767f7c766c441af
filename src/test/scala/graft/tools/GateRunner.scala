package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): run a subset of gate queries and dump results +
  * oracle SQL for local DuckDB comparison, mirroring the driver's
  * correctness harness.
  *
  * Usage: sbt "Test/runMain graft.tools.GateRunner <sfDir> <outDir> [q..]"
  * With no query names, runs every gate.
  */
object GateRunner {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GateRunner <sfDir> <outDir> [queryName...]")
    val sfDir = args(0)
    val outDir = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_CPUS lets the cross-parallelism determinism sweep
    // (rows.tsv diffs between CPUS=32 and CPUS=5) run through this tool
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.oracleSfDir = sfDir
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      graft.Verify.assertComparatorSafe(df, n)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      graft.Verify.dumpCanonicalRows(spark, s"$outDir/$n",
        s"$outDir/$n.rows.tsv")
    }
    val osql = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = osql.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json.getBytes)
    spark.stop()
  }
}
