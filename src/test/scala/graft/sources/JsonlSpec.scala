package graft.sources

import org.apache.spark.sql.types._
import graft.SparkTestBase

/** JSON-Lines interchange (Tables.writeJsonl/loadJsonl): escaping fidelity
  * and explicit-schema reads. */
class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("text", StringType)))

  test("round-trip preserves quotes, backslashes, newlines, unicode, empties") {
    val rows = Seq(
      (1L, """she said "hi" and left"""),
      (2L, "back\\slash and tab\there"),
      (3L, "line\nbreak stays one RECORD"),
      (4L, "emoji 😀 and café"),
      (5L, ""),
      (6L, null.asInstanceOf[String]))
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec").toString
    Tables.writeJsonl(rows.toDF("id", "text"), dir)
    val back = Tables.loadJsonl(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { case (id, t) => assert(back(id) == t, s"row $id") }
  }

  test("inferJsonlSchema recovers column structure") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec2").toString
    Tables.writeJsonl(Seq((1L, "a", 0.5)).toDF("id", "s", "x"), dir)
    val inferred = Tables.inferJsonlSchema(spark, dir)
    assert(inferred.fieldNames.sorted.toSeq == Seq("id", "s", "x"))
  }

  test("malformed lines yield NULLs, not job failure (PERMISSIVE)") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec3").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1, \"text\": \"ok\"}\nnot json at all\n{\"id\": 3, \"text\": \"fine\"}\n".getBytes)
    val back = Tables.loadJsonl(spark, dir, schema)
    assert(back.count() == 3)
    assert(back.where("id IS NOT NULL").count() == 2)
  }
}
