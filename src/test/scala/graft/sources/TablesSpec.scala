package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the events.ts normalization (round-7 incident: the
  * driver regenerated events.parquet with plain TIMESTAMP(MICROS)
  * isAdjustedToUTC=false — inferred by Spark 4 as TIMESTAMP_NTZ — and
  * `Tables.normalize`, written for the older INT64(NANOS) encoding, passed
  * the NTZ column through untouched, failing analysis for `unix_micros` /
  * `session_window` in four gates). Both encodings must normalize to
  * TimestampType, value-identically under the UTC session timezone.
  */
class TablesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("events.ts loads as TimestampType whatever the parquet encoding") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // event-time functions that failed in round 7 must analyze and run
    assert(ev.selectExpr("unix_micros(ts)").count() > 0)
  }

  test("NTZ and long-nanos encodings normalize to identical instants") {
    val dir = java.nio.file.Files.createTempDirectory("tables-ts").toString
    val micros = Seq(0L, 1723500000000000L, 1723500123456789L)
    // NTZ arm: write a real TIMESTAMP_NTZ parquet column
    micros.toDF("us").selectExpr("cast(1 as bigint) as event_id",
        "timestamp_micros(us) as ts")
      .withColumn("ts", $"ts".cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // long-nanos arm: what nanosAsLong=true yields from TIMESTAMP(NANOS)
    micros.toDF("us").selectExpr("cast(1 as bigint) as event_id",
        "us * 1000 as ts")
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
    val ntz = Tables.load(spark, s"$dir/ntz", "events")
    val nanos = Tables.load(spark, s"$dir/nanos", "events")
    assert(ntz.schema("ts").dataType == TimestampType)
    assert(nanos.schema("ts").dataType == TimestampType)
    val a = ntz.select(unix_micros($"ts")).as[Long].collect().sorted
    val b = nanos.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(a.toSeq == b.toSeq && a.toSeq == micros.sorted)
  }

  test("streaming load normalizes ts per micro-batch") {
    val ev = Tables.loadStream(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
  }
}
