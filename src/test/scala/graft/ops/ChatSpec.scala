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

  test("encodeTurns: layout, loss mask, and specials arithmetic") {
    // Chat block: pad=0 bos=1 eos=2 unk=3 sys=4 user=5 asst=6 end=7,
    // reserve=8
    val sp = SpecialTokens.Chat
    val turns = Seq(
      (1L, 0, "system", Seq(0L, 1L)),
      (1L, 1, "user", Seq(2L)),
      (1L, 2, "assistant", Seq(0L, 3L)),
      (2L, 0, "user", Seq.empty[Long]),
      (2L, 1, "assistant", Seq(5L)))
      .toDF("conv", "turn", "role", "ids")
    val out = Chat.encodeTurns(turns, "conv", "turn", "role", "ids", sp)
      .orderBy("conv").collect()
    val r1 = out(0)
    assert(r1.getAs[scala.collection.Seq[Long]]("input_ids").toSeq ==
      Seq(1L, 4L, 8L, 9L, 7L, 5L, 10L, 7L, 6L, 8L, 11L, 7L, 2L))
    assert(r1.getAs[scala.collection.Seq[Int]]("loss_mask").toSeq ==
      Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0))
    assert(r1.getAs[Long]("n_tokens") == 13L)
    assert(r1.getAs[Long]("n_loss") == 3L)
    // empty user content: bare [marker, end] frame; assistant end is
    // loss-masked
    val r2 = out(1)
    assert(r2.getAs[scala.collection.Seq[Long]]("input_ids").toSeq ==
      Seq(1L, 5L, 7L, 6L, 13L, 7L, 2L))
    assert(r2.getAs[scala.collection.Seq[Int]]("loss_mask").toSeq == Seq(0, 0, 0, 0, 1, 1, 0))
  }

  test("encodeTurns: unknown role raises instead of nulling the sample") {
    val turns = Seq((1L, 0, "tool", Seq(0L)))
      .toDF("conv", "turn", "role", "ids")
    val ex = intercept[Exception] {
      Chat.encodeTurns(turns, "conv", "turn", "role", "ids").collect()
    }
    assert(ex.getMessage.contains("unknown chat role") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown chat role")))
  }

  test("padSample: truncation and padding with attention mask") {
    val sp = SpecialTokens.Chat
    val df = Seq((Seq(1L, 4L, 8L, 7L, 2L), Seq(0, 0, 1, 1, 0)))
      .toDF("ids", "mask")
    // pad: 5 real + 3 pad
    val p = df.select(Chat.padSample(col("ids"), col("mask"), sp, 8)
      .as("s")).select("s.*").head()
    assert(p.getAs[scala.collection.Seq[Long]]("input_ids").toSeq ==
      Seq(1L, 4L, 8L, 7L, 2L, 0L, 0L, 0L))
    assert(p.getAs[scala.collection.Seq[Int]]("loss_mask").toSeq == Seq(0, 0, 1, 1, 0, 0, 0, 0))
    assert(p.getAs[scala.collection.Seq[Int]]("attention_mask").toSeq ==
      Seq(1, 1, 1, 1, 1, 0, 0, 0))
    // truncate: both arrays cut, attention all-1
    val tr = df.select(Chat.padSample(col("ids"), col("mask"), sp, 3)
      .as("s")).select("s.*").head()
    assert(tr.getAs[scala.collection.Seq[Long]]("input_ids").toSeq == Seq(1L, 4L, 8L))
    assert(tr.getAs[scala.collection.Seq[Int]]("loss_mask").toSeq == Seq(0, 0, 1))
    assert(tr.getAs[scala.collection.Seq[Int]]("attention_mask").toSeq == Seq(1, 1, 1))
  }

  test("preferencePairs: argmax/argmin with opposing tie rules") {
    val cands = Seq(
      // g0: score tie at the top → chosen = LOWEST id; clear min
      (0L, 1L, 5L), (0L, 2L, 5L), (0L, 3L, 2L),
      // g1: all tied → chosen = lowest id, rejected = highest, margin 0
      (1L, 4L, 7L), (1L, 5L, 7L),
      // g2: single candidate → dropped
      (2L, 6L, 9L),
      // g3: score tie at the bottom → rejected = HIGHEST id
      (3L, 7L, 1L), (3L, 8L, 1L), (3L, 9L, 4L))
      .toDF("grp", "id", "score")
    val got = Chat.preferencePairs(cands, "grp", "id", "score")
      .orderBy("grp")
      .select("grp", "chosen_id", "rejected_id", "margin",
        "n_candidates")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(
      (0L, 1L, 3L, 3L, 3L),
      (1L, 4L, 5L, 0L, 2L),
      (3L, 9L, 8L, 3L, 3L)))
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
