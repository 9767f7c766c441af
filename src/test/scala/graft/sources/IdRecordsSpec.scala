package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Fixed-width id-record framing: exact round-trip, empty frames, byte
  * layout by hand. */
class IdRecordsSpec extends SparkTestBase {
  import spark.implicits._

  test("encode/decode round-trips random id sequences exactly") {
    val rnd = new scala.util.Random(271828)
    val rows = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(20))(rnd.nextLong(1L << 40)))
    }
    val got = rows.toDF("doc_id", "ids")
      .select(IdRecords.encodeRecord(col("doc_id"), col("ids")).as("rec"))
      .select(IdRecords.decodeId(col("rec")).as("doc_id"),
        IdRecords.decodeIds(col("rec")).as("ids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList))
      .sortBy(_._1).toList
    assert(got == rows.map { case (i, s) => (i, s.toList) }.toList)
  }

  test("byte layout by hand: 8-byte BE id, 8 bytes per token id") {
    val rec = Seq((258L, Seq(1L, 256L))).toDF("doc_id", "ids")
      .select(IdRecords.encodeRecord(col("doc_id"), col("ids")))
      .collect().head.getAs[Array[Byte]](0)
    assert(rec.length == 24)
    assert(rec.slice(0, 8).toList ==
      List[Byte](0, 0, 0, 0, 0, 0, 1, 2)) // 258 = 0x0102
    assert(rec.slice(8, 16).toList == List[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assert(rec.slice(16, 24).toList == List[Byte](0, 0, 0, 0, 0, 0, 1, 0))
  }

  test("linear framing is byte-identical to the reference binary fold") {
    // The original (quadratic) framing: fold be8 limbs with concat.
    def be8(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 16, "0"))
    def foldFrame(id: org.apache.spark.sql.Column,
                  ids: org.apache.spark.sql.Column) =
      aggregate(ids, be8(id), (acc, x) => concat(acc, be8(x)))

    val rnd = new scala.util.Random(31415)
    val rows = (0L until 100L).map { i =>
      (i, Seq.fill(rnd.nextInt(64))(rnd.nextLong(1L << 62)))
    } :+ (100L, Seq.empty[Long]) :+ (101L, Seq(0L, Long.MaxValue))
    val diff = rows.toDF("doc_id", "ids")
      .select(
        IdRecords.encodeRecord(col("doc_id"), col("ids")).as("lin"),
        foldFrame(col("doc_id"), col("ids")).as("fold"))
      .filter(not(col("lin") === col("fold")))
      .count()
    assert(diff == 0L)
  }

  test("empty id sequence frames as the bare 8-byte id") {
    val got = Seq((7L, Seq.empty[Long])).toDF("doc_id", "ids")
      .select(IdRecords.encodeRecord(col("doc_id"), col("ids")).as("rec"))
      .select(octet_length(col("rec")),
        IdRecords.decodeId(col("rec")),
        size(IdRecords.decodeIds(col("rec"))))
      .collect().head
    assert(got.getInt(0) == 8 && got.getLong(1) == 7L && got.getInt(2) == 0)
  }
}
