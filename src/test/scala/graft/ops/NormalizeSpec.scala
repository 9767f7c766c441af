package graft.ops

import graft.SparkTestBase
import graft.api.{functions => gf}
import org.apache.spark.sql.functions._

/** Unicode normalization (expr/normexprs.scala): each mode against
  * hand-computed expectations, plus the composite `clean` pipeline and the
  * SQL surface. Strings are written with explicit \uXXXX escapes so the
  * expectations are visible in the source. */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String, mode: String): String =
    Seq(s).toDF("t")
      .select(gf.unicode_normalize(col("t"), mode).as("r"))
      .head().getString(0)

  test("nfc composes, nfd decomposes") {
    // "a" + combining acute (U+0301) composes to U+00E1
    assert(norm("á", "nfc") == "á")
    assert(norm("á", "nfd") == "á")
    // Hangul syllable round-trips through NFC
    val hangul = "각"
    assert(norm(norm(hangul, "nfd"), "nfc") == hangul)
  }

  test("nfkc folds compatibility forms, nfc does not") {
    // LATIN SMALL LIGATURE FI (U+FB01) is compatibility-only
    assert(norm("ﬁle", "nfc") == "ﬁle")
    assert(norm("ﬁle", "nfkc") == "file")
    // fullwidth A (U+FF21)
    assert(norm("Ａ", "nfkc") == "A")
  }

  test("strip_accents drops marks from composed AND decomposed input") {
    assert(norm("café", "strip_accents") == "cafe")
    assert(norm("café", "strip_accents") == "cafe")
    assert(norm("naïve Ångström", "strip_accents")
      == "naive Angstrom")
    // ligature survives (canonical decomposition only — utf8proc parity)
    assert(norm("ﬁle", "strip_accents") == "ﬁle")
    // Hangul survives (NFC recomposition after the NFD pass)
    assert(norm("각", "strip_accents") == "각")
    // Greek tonos drops
    assert(norm("ά", "strip_accents") == "α")
  }

  test("casefold lowers in the root locale") {
    assert(norm("Straße ABC", "casefold") == "straße abc")
    assert(norm("ÉCLAIR", "casefold") == "éclair")
  }

  test("squash_ws collapses ASCII whitespace runs and trims") {
    assert(norm("  a \t\t b\r\nc  ", "squash_ws") == "a b c")
    assert(norm("\t", "squash_ws") == "")
  }

  test("clean = nfc then casefold then strip_accents then squash_ws") {
    assert(norm("  CAFÉ   du\tMonde ", "clean") == "cafe du monde")
    assert(norm("Naïve  ÅNGSTRÖM", "clean")
      == "naive angstrom")
  }

  test("null propagates; unknown mode fails") {
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(gf.normalize_text(col("t")).as("r")).head()
    assert(r.isNullAt(0))
    val e = intercept[Exception](norm("x", "bogus"))
    assert(e.getMessage.contains("unknown mode") ||
      e.getCause != null && e.getCause.getMessage.contains("unknown mode"))
  }

  test("SQL surface: unicode_normalize and normalize_text") {
    val r = spark.sql(
      "SELECT unicode_normalize('café', 'nfc') AS a, " +
        "normalize_text('  CAFÉ ') AS b").head()
    assert(r.getString(0) == "café")
    assert(r.getString(1) == "cafe")
  }

  test("deflate_ratio matches java.util.zip and orders text by redundancy") {
    def direct(s: String): Double = {
      val raw = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1 << 16)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      d.end()
      out.toDouble / raw.length
    }
    val repetitive = "spam " * 200
    val natural = (0 until 200).map(i => s"w${(i * 37) % 151}").mkString(" ")
    val noise = (0 until 1000).map(i =>
      (graft.expr.TextHash.avalanche(i.toLong) & 0x7f | 0x20).toChar)
      .mkString
    val got = Seq(repetitive, natural, noise).toDF("t")
      .select(gf.deflate_ratio(col("t")).as("r")).collect().map(_.getDouble(0))
    assert(got(0) == direct(repetitive))
    assert(got(1) == direct(natural))
    assert(got(2) == direct(noise))
    assert(got(0) < got(1) && got(1) < got(2),
      s"ordering: ${got.toSeq}")
    // 96-symbol pseudo-noise still carries ~6.6 bits/char of the 8 zlib
    // sees, so it lands near 0.78 — well above prose, far above spam
    assert(got(0) < 0.1 && got(2) > 0.7)
    // empty → 1.0; null → null; SQL path
    val edge = Seq[(Integer, String)]((1, ""), (2, null)).toDF("i", "t")
      .select(gf.deflate_ratio(col("t")).as("r")).collect()
    assert(edge(0).getDouble(0) == 1.0 && edge(1).isNullAt(0))
    assert(spark.sql("SELECT deflate_ratio('aaaaaaaaaaaaaaaa')")
      .head().getDouble(0) < 1.0)
  }

  test("script_stats classifies by range, picks the dominant script, SQL path") {
    val r = Seq(Tuple1("ab1 абв 一二 א xyz"))
      .toDF("t")
      .select(gf.script_stats(col("t")).as("s"))
      .select(col("s.n_latin"), col("s.n_digit"), col("s.n_cyrillic"),
        col("s.n_cjk"), col("s.n_hebrew"), col("s.n_other"),
        col("s.main_script"))
      .head()
    assert(r.getInt(0) == 5) // ab xyz
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 1)
    assert(r.getInt(5) == 0)
    assert(r.getString(6) == "latin")
    // tie goes to the earlier field: 1 latin vs 1 cyrillic → latin
    val tie = Seq(Tuple1("a а")).toDF("t")
      .select(gf.script_stats(col("t")).as("s"))
      .select(col("s.main_script")).head().getString(0)
    assert(tie == "latin")
    // empty → all zero, main 'none'; null propagates
    val e = Seq(Tuple1("")).toDF("t")
      .select(gf.script_stats(col("t")).as("s"))
      .select(col("s.n_latin"), col("s.main_script")).head()
    assert(e.getInt(0) == 0 && e.getString(1) == "none")
    val viaSql = spark.sql(
      "SELECT script_stats('αβγ ok').main_script")
      .head().getString(0)
    assert(viaSql == "greek")
  }

  test("round-8 signal expressions are codegen'd (no CodegenFallback)") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
      .select(gf.normalize_text(col("text")).as("a"),
        gf.deflate_ratio(col("text")).as("b"),
        gf.script_stats(col("text")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("deflate_ratio") && l.contains("*(")), plan)
  }

  test("normalization folds variants onto one dedup key") {
    // the motivating property: all encodings of "café du monde" hash equal
    val variants = Seq("Café du Monde", "café  du monde",
      "CAFÉ\tDU MONDE", " cafe du  monde ")
    val keys = variants.toDF("t")
      .select(gf.hash64(gf.normalize_text(col("t"))).as("k"))
      .distinct().count()
    assert(keys == 1L)
  }
}
