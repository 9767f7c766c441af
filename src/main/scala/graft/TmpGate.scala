package graft

import org.apache.spark.sql.SparkSession

/** Scratch gate runner (temporary — deleted before commit). */
object TmpGate {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/gate/$n")
    }
    val osql = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = osql.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/gate/oracle.json"),
      json.getBytes)
    spark.stop()
  }
}
