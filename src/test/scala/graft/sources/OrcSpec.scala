package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OrcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("ORC round-trip is lossless, schema self-describing") {
    val rows = Seq(
      (1L, "plain text", Seq(0.5f, -1.0f)),
      (2L, "unicode é中文 and \"quotes\", commas", Seq(1f)),
      (3L, "", Seq.empty[Float]),
      (4L, null.asInstanceOf[String], Seq(2f, 3f)))
    val df = rows.toDF("id", "text", "vec")
    val dir = java.nio.file.Files.createTempDirectory("orc-spec").toString
    Tables.writeOrc(df, dir)
    val back = Tables.loadOrc(spark, dir)
    // schema came from the file, including the nested array type
    // (nullability widens — ORC fields are nullable — so compare shape)
    assert(back.schema.map(f => (f.name, f.dataType.sql)) ==
      df.schema.map(f => (f.name, f.dataType.sql)))
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("fixture documents survive bit-for-bit; filter pushes to the scan") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = java.nio.file.Files.createTempDirectory("orc-docs").toString
    Tables.writeOrc(docs, dir)
    val back = Tables.loadOrc(spark, dir)
    val sig = (d: org.apache.spark.sql.DataFrame) =>
      d.agg(bit_xor(xxhash64(col("doc_id"), col("text"), col("lang"),
        col("source")))).head().getLong(0)
    assert(sig(back) == sig(docs))

    // predicate pushdown + column pruning reach the ORC scan
    val q = back.where(col("doc_id") > 100).select("doc_id", "source")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), " +
      "GreaterThan(doc_id,100)]"), scan)
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      scan)
  }
}
