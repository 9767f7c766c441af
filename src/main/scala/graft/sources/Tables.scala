package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (TESTDATA.md).
  *
  * `events.parquet` has carried two timestamp encodings across driver
  * regenerations: TIMESTAMP(NANOS) (readable only with
  * spark.sql.legacy.parquet.nanosAsLong=true, set in [[sessionConfigs]])
  * and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
  * infers as TIMESTAMP_NTZ. [[load]] normalizes BOTH back to a proper
  * TimestampType (microsecond, UTC-session) column so event-time windowing
  * (`unix_micros`, `session_window`) works and semantics match the DuckDB
  * oracle's naive timestamps under a UTC session timezone.
  */
object Tables {
  /** Configs every graft session should set (see also Verify/Bench mains). */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(name, spark.read.parquet(s"$dir/$name.parquet"))

  /** Streaming variant of [[load]] — same (dir, name) layout: streams the
    * table's own `$dir/$name.parquet` path only, never sibling tables. The
    * raw (pre-normalization) schema must be used — the parquet reader cannot
    * coerce INT64(NANOS) to TimestampType, so the nanos column streams as
    * long and is normalized per micro-batch. */
  def loadStream(spark: SparkSession, dir: String, name: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val path = s"$dir/$name.parquet"
    val raw = spark.read.parquet(path).schema
    normalize(name, spark.readStream.schema(raw).options(options).parquet(path))
  }

  /** Write a frame as JSON-Lines — the interchange format of text-corpus
    * pipelines (one JSON object per line; splittable when uncompressed or
    * per-file compressed, so downstream reads stay parallel). */
  def writeJsonl(df: DataFrame, path: String,
      compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Read JSON-Lines with an EXPLICIT schema. Schema inference is a full
    * extra pass over the data — at corpus scale always pass the schema
    * (or read one file's worth via [[inferJsonlSchema]] first). Malformed
    * lines yield NULL columns (PERMISSIVE) rather than failing the job. */
  def loadJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Dev convenience: infer a JSONL schema; lower `sampleRatio` to bound
    * the inference pass on large inputs. */
  def inferJsonlSchema(spark: SparkSession, path: String,
      sampleRatio: Double = 1.0): org.apache.spark.sql.types.StructType =
    spark.read.option("samplingRatio", sampleRatio).json(path).schema

  /** Write a frame as headered CSV with full quoting/escaping — the other
    * interchange format corpora arrive in. Splittable like JSONL when
    * uncompressed; free text survives because every field is quoted and
    * embedded quotes escape by doubling (RFC 4180). */
  def writeCsv(df: DataFrame, path: String,
      compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      // the WRITER trims field whitespace by default — corpus text must
      // survive byte-for-byte
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("compression", compression).csv(path)

  /** Read CSV with an EXPLICIT schema (inference is a full extra pass —
    * at corpus scale always pass the schema). Options mirror [[writeCsv]]
    * so a round-trip is lossless for printable text; malformed lines
    * yield NULL columns (PERMISSIVE) rather than failing the job. */
  def loadCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
      .csv(path)

  /** Write a frame as ORC — the other columnar warehouse format corpora
    * arrive in (Hive/Trino shops). Self-describing schema, splittable
    * stripes, min/max stripe statistics, so read-back gets predicate
    * pushdown and column pruning like parquet. */
  def writeOrc(df: DataFrame, path: String,
      compression: String = "zlib"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Read ORC. The file carries its own schema (no explicit-schema dance
    * like CSV/JSONL); filters and projections push into the stripe reader
    * — assert `PushedFilters` in the scan when a pipeline depends on it
    * (OrcSpec does). */
  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  private def normalize(name: String, df: DataFrame): DataFrame =
    if (name != "events") df
    else df.schema("ts").dataType match {
      // legacy TIMESTAMP(NANOS) read as long nanos via nanosAsLong=true
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP(MICROS) isAdjustedToUTC=false inferred as NTZ; with the
      // session timezone pinned to UTC this cast is value-preserving and
      // matches DuckDB's naive-timestamp reading of the same file
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
