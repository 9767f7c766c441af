package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SFT/chat-template rendering (ops/Chat.scala). */
class ChatSpec extends SparkTestBase {
  import spark.implicits._

  test("render: spans slice exactly the assistant content") {
    val turns = Seq(
      (1L, 0, "system", "be brief"),
      (1L, 1, "user", "hi there"),
      (1L, 2, "assistant", "hello!"),
      (1L, 3, "user", "more?"),
      (1L, 4, "assistant", "sure thing"),
      (2L, 0, "user", "solo"),
      (2L, 1, "assistant", ""))
      .toDF("conv", "turn", "role", "content")
    val out = Chat.render(turns, "conv", "turn", "role", "content")
      .orderBy("conv").collect()
    val r1 = out(0)
    val text1 = r1.getAs[String]("text")
    assert(text1 ==
      "<|system|>\nbe brief\n<|end|>\n" +
      "<|user|>\nhi there\n<|end|>\n" +
      "<|assistant|>\nhello!\n<|end|>\n" +
      "<|user|>\nmore?\n<|end|>\n" +
      "<|assistant|>\nsure thing\n<|end|>\n")
    assert(r1.getAs[Long]("n_turns") == 5)
    assert(r1.getAs[Long]("n_mask_chars") == "hello!".length + "sure thing".length)
    val spans1 = r1.getAs[String]("mask_spans").split(",")
      .map { s => val Array(a, b) = s.split(":"); (a.toInt, b.toInt) }
    assert(spans1.length == 2)
    assert(spans1.map { case (a, b) => text1.substring(a, b) }.toList ==
      List("hello!", "sure thing"))
    // empty assistant content: empty span at the marker position
    val r2 = out(1)
    val text2 = r2.getAs[String]("text")
    val Array(a2, b2) = r2.getAs[String]("mask_spans").split(":")
    assert(a2.toInt == b2.toInt)
    assert(text2.substring(0, a2.toInt).endsWith("<|assistant|>\n"))
  }

  test("render: no assistant turns → empty mask, order by turn col") {
    val turns = Seq((9L, 2, "user", "b"), (9L, 1, "system", "a"))
      .toDF("conv", "turn", "role", "content")
    val r = Chat.render(turns, "conv", "turn", "role", "content").head()
    assert(r.getAs[String]("text") ==
      "<|system|>\na\n<|end|>\n<|user|>\nb\n<|end|>\n")
    assert(r.getAs[String]("mask_spans") == "")
    assert(r.getAs[Long]("n_mask_chars") == 0)
  }
}
