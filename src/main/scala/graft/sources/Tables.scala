package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (TESTDATA.md).
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark 4 only reads with
  * spark.sql.legacy.parquet.nanosAsLong=true (set in [[sessionConfigs]]);
  * [[load]] normalizes the resulting long-nanos column back to a proper
  * TimestampType (microsecond) column so event-time windowing works.
  */
object Tables {
  /** Configs every graft session should set (see also Verify/Bench mains). */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType) {
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    } else df
  }
}
