package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Reserved special-token blocks: wrap/strip inverse, the id offset
  * rule, fixed-length padding, and the store round-trip that makes the
  * offset part of the persisted model. */
class SpecialsSpec extends SparkTestBase {
  import spark.implicits._

  private val sp = SpecialTokens.Default

  test("Default block: pad=0 bos=1 eos=2 unk=3, reserve=4") {
    assert(sp.padId == 0L && sp.bosId == 1L && sp.eosId == 2L &&
      sp.unkId == 3L && sp.reserve == 4L)
  }

  test("wrap shifts content ids and frames with bos/eos; empty wraps bare") {
    val got = Seq(Seq(0L, 5L, 40L), Seq.empty[Long]).toDF("ids")
      .select(Specials.wrap(col("ids"), sp).as("w"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(got == List(List(1L, 4L, 9L, 44L, 2L), List(1L, 2L)))
  }

  test("strip is the exact inverse of wrap, and drops pad ids too") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map(_ =>
      Seq.fill(rnd.nextInt(30))(rnd.nextLong(1L << 50)))
    val bad = rows.toDF("ids")
      .select(col("ids"),
        Specials.strip(Specials.padTo(
          Specials.wrap(col("ids"), sp), sp, 64), sp).as("back"))
      .filter(not(col("ids") === col("back")))
      .count()
    assert(bad == 0L)
  }

  test("padTo truncates long rows and right-pads short ones") {
    val got = Seq(Seq(1L, 4L, 5L, 2L), Seq(1L, 4L, 5L, 6L, 7L, 2L))
      .toDF("ids")
      .select(Specials.padTo(col("ids"), sp, 5).as("p"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(got == List(List(1L, 4L, 5L, 2L, 0L), List(1L, 4L, 5L, 6L, 7L)))
  }

  test("specials block round-trips through the tokenizer store") {
    val dir = java.nio.file.Files.createTempDirectory("specstore").toString
    assert(TokenizerStore.loadSpecials(spark, dir + "/none").isEmpty)
    val custom = SpecialTokens(Vector("<pad>", "<bos>", "<eos>", "<unk>",
      "<mask>", "<sep>"))
    TokenizerStore.saveSpecials(spark, dir, custom)
    val back = TokenizerStore.loadSpecials(spark, dir)
    assert(back.contains(custom))
    assert(back.get.id("<mask>") == 4L && back.get.reserve == 6L)
  }

  test("a block refuses duplicate pieces and unknown lookups") {
    intercept[IllegalArgumentException] {
      SpecialTokens(Vector("<pad>", "<pad>"))
    }
    intercept[IllegalArgumentException] {
      SpecialTokens(Vector("<pad>")).id("<bos>")
    }
  }
}
