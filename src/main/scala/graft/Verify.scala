package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The external driver's pandas comparator sorts every output column and
    * crashes on non-scalar cells (round-9 lesson: q171's raw ids array →
    * `TypeError: unhashable type: 'numpy.ndarray'`). Refuse such schemas
    * HERE so the local mirror can never pass what the driver crashes on. */
  def assertComparatorSafe(df: org.apache.spark.sql.DataFrame,
      name: String): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.sql}"
    }
    require(bad.isEmpty, s"gate $name emits non-scalar column(s) the " +
      s"driver comparator cannot sort: ${bad.mkString(", ")} — emit scalar " +
      "receipts instead (q136 convention)")
  }

  /** Canonical row-dump artifact: the gate's rows exactly as the driver's
    * comparator sees them (columns sorted by name, rows sorted as formatted
    * tuples), written as `<name>.rows.tsv` next to the parquet. Round-10
    * lesson: q202's driver-side hash mismatch did not reproduce under the
    * local mirror, an independent reimplementation at three scales, or
    * three back-to-back runs — with no row-level artifact from the
    * driver's own sweep, the divergence was unobservable. This file makes
    * any future red cell diffable: compare the sweep's artifact against a
    * local rerun — identical ⇒ the oracle side differs; different ⇒ the
    * engine is nondeterministic, and the diff shows exactly where.
    * Reads back the just-written parquet (never re-executes the gate). */
  def dumpCanonicalRows(spark: SparkSession, parquetDir: String,
      artifactPath: String): Unit = {
    val df = spark.read.parquet(parquetDir)
    val cols = df.columns.sorted.toIndexedSeq
    def fmt(v: Any): String = v match {
      case null => "␀" // ␀: distinct from the literal string "null"
      case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
      case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
      case d: java.lang.Double => java.lang.Double.toString(d)
      case f: java.lang.Float => java.lang.Float.toString(f)
      case other => other.toString
    }
    val lines = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => (0 until r.length).map(i => fmt(r.get(i))).mkString("\t"))
      .sorted
    val sb = new StringBuilder
    sb.append(cols.mkString("\t")).append('\n')
    lines.foreach(l => sb.append(l).append('\n'))
    Files.writeString(Paths.get(artifactPath), sb.toString)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated name prefixes (dev-only filter;
    // the driver always passes exactly two args → full run)
    val only = args.drop(2).headOption.map(_.split(',').toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.oracleSfDir = sfDir
    new java.io.File(outDir).mkdirs()
    var nFailed = 0
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertComparatorSafe(df, name)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        dumpCanonicalRows(spark, s"$outDir/$name", s"$outDir/$name.rows.tsv")
      }
      catch { case e: Throwable =>
        nFailed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A thrown gate must NOT vanish from the correctness report: write a
        // 1-row marker result whose schema can never match the oracle, so the
        // driver's compare emits a visible mismatch entry for this query
        // instead of silently shrinking coverage (round-7 lesson: four gates
        // disappeared from CORRECTNESS_r07.json with every remaining entry
        // green).
        import spark.implicits._
        Seq(Option(e.getMessage).getOrElse(e.getClass.getName))
          .toDF("__verify_error")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      // per-gate storage hygiene: same block-accumulation fix as Bench —
      // a 380-gate dump in one JVM otherwise drags as checkpoint blocks
      // pile into storage memory (round-14 VERDICT item 2)
      graft.ops.CheckpointUtil.releaseAll(spark)
    }
    System.err.println(s"[verify] n_failed=$nFailed")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
