package graft.expr

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning.
  *
  * The single most common preprocessing step of a web-scale text pipeline:
  * fold the billion raw byte-sequences that mean the same text ("Café",
  * "café", "café") onto one canonical form BEFORE hashing, dedup,
  * shingling, or vocabulary building — otherwise every dedup family
  * upstream silently under-recalls on the encoded variants.
  *
  * Modes (all pure per-row functions — scan-side, shuffle-free,
  * partitioning-independent):
  *  - `nfc` / `nfd` / `nfkc` / `nfkd`: the four standard Unicode
  *    normalization forms (java.text.Normalizer).
  *  - `strip_accents`: NFD, drop all Mark codepoints (Mn/Mc/Me), NFC —
  *    "Ångström" → "Angstrom". Canonical decomposition only, so ligatures
  *    and fullwidth forms survive (parity with utf8proc's strip-accents
  *    semantics, which external oracles implement).
  *  - `casefold`: Unicode-aware lowercase in the root locale (no Turkish
  *    dotless-i surprises).
  *  - `squash_ws`: runs of ASCII whitespace [ \t\n\x0B\f\r] collapse to a
  *    single space, then ends trim. The \s class is deliberately ASCII —
  *    the same set RE2 and Java agree on — so oracle regexes match.
  *  - `clean`: the composite pipeline normalizer
  *    nfc → casefold → strip_accents → squash_ws, in that order.
  */
object NormKernels {
  /** ASCII \s — the intersection regex engines agree on. */
  private val WsRun = Pattern.compile("\\s+")

  def nfc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFC)
  def nfd(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFD)
  def nfkc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKC)
  def nfkd(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKD)

  def stripAccents(s: String): String = {
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      val cat = Character.getType(cp)
      if (cat != Character.NON_SPACING_MARK &&
          cat != Character.COMBINING_SPACING_MARK &&
          cat != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }

  def casefold(s: String): String = s.toLowerCase(Locale.ROOT)

  def squashWs(s: String): String =
    WsRun.matcher(s).replaceAll(" ").trim

  def clean(s: String): String =
    squashWs(stripAccents(casefold(nfc(s))))

  private val MNfc = UTF8String.fromString("nfc")
  private val MNfd = UTF8String.fromString("nfd")
  private val MNfkc = UTF8String.fromString("nfkc")
  private val MNfkd = UTF8String.fromString("nfkd")
  private val MStrip = UTF8String.fromString("strip_accents")
  private val MCase = UTF8String.fromString("casefold")
  private val MWs = UTF8String.fromString("squash_ws")
  private val MClean = UTF8String.fromString("clean")

  /** Dispatch on the (almost always literal) mode. The byte-compare is
    * nanoseconds next to the normalization itself. */
  def normalize(t: UTF8String, mode: UTF8String): UTF8String = {
    val s = t.toString
    val out =
      if (mode.equals(MClean)) clean(s)
      else if (mode.equals(MNfc)) nfc(s)
      else if (mode.equals(MNfd)) nfd(s)
      else if (mode.equals(MNfkc)) nfkc(s)
      else if (mode.equals(MNfkd)) nfkd(s)
      else if (mode.equals(MStrip)) stripAccents(s)
      else if (mode.equals(MCase)) casefold(s)
      else if (mode.equals(MWs)) squashWs(s)
      else throw new IllegalArgumentException(
        s"unicode_normalize: unknown mode '$mode' (expected nfc|nfd|nfkc|" +
          "nfkd|strip_accents|casefold|squash_ws|clean)")
    UTF8String.fromString(out)
  }

  /** Java-reachable name of this object for generated code. */
  val RefName: String =
    classOf[NormKernels.type].getName.stripSuffix("$") + "$.MODULE$"
}

/** Per-script character histogram — the multilingual routing signal:
  * which writing systems a document actually uses (vs the `lang` column
  * someone scraped). Script mixes catch mislabeled documents, transliterated
  * spam, and code-switching, and decide which language-specific pipeline
  * (tokenizer, stopwords, LM) a document should enter.
  *
  * Classification is by EXPLICIT codepoint ranges (not the JDK's
  * Character.UnicodeScript) so an external SQL oracle can reproduce every
  * count from the same integer comparisons. Ranges cover the majors;
  * anything else lands in `n_other`. Whitespace is excluded from all
  * counts. */
object ScriptKernels {
  // (field, lo, hi) inclusive codepoint ranges, first match wins
  val Ranges: Array[(String, Int, Int)] = Array(
    ("latin", 0x41, 0x5A), ("latin", 0x61, 0x7A), ("latin", 0xC0, 0x24F),
    ("digit", 0x30, 0x39),
    ("greek", 0x370, 0x3FF),
    ("cyrillic", 0x400, 0x4FF),
    ("hebrew", 0x590, 0x5FF),
    ("arabic", 0x600, 0x6FF),
    ("devanagari", 0x900, 0x97F),
    ("hangul", 0x1100, 0x11FF), ("hangul", 0xAC00, 0xD7AF),
    ("cjk", 0x3040, 0x30FF), ("cjk", 0x3400, 0x4DBF),
    ("cjk", 0x4E00, 0x9FFF))

  val Fields: Array[String] = Array("latin", "digit", "greek", "cyrillic",
    "hebrew", "arabic", "devanagari", "hangul", "cjk", "other")

  def scriptStats(t: UTF8String): GenericInternalRow = {
    val s = t.toString
    val counts = new Array[Int](Fields.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!Character.isWhitespace(cp)) {
        var hit = -1
        var r = 0
        while (hit < 0 && r < Ranges.length) {
          if (cp >= Ranges(r)._2 && cp <= Ranges(r)._3)
            hit = Fields.indexOf(Ranges(r)._1)
          r += 1
        }
        counts(if (hit < 0) Fields.length - 1 else hit) += 1
      }
      i += Character.charCount(cp)
    }
    // dominant script: max count, ties to the earlier field (stable)
    var best = 0
    var b = 1
    while (b < counts.length) {
      if (counts(b) > counts(best)) best = b
      b += 1
    }
    val row = new GenericInternalRow(Fields.length + 1)
    var f = 0
    while (f < counts.length) { row.setInt(f, counts(f)); f += 1 }
    row.update(Fields.length, UTF8String.fromString(
      if (counts(best) == 0) "none" else Fields(best)))
    row
  }

  val RefName: String =
    classOf[ScriptKernels.type].getName.stripSuffix("$") + "$.MODULE$"
}

object ScriptStatsExpr {
  val schema: StructType = StructType(
    ScriptKernels.Fields.map(f =>
      StructField(s"n_$f", IntegerType, nullable = false)) :+
      StructField("main_script", StringType, nullable = false))
}

/** script_stats(text) → struct{n_latin, n_digit, n_greek, n_cyrillic,
  * n_hebrew, n_arabic, n_devanagari, n_hangul, n_cjk, n_other,
  * main_script}. See [[ScriptKernels]]. */
case class ScriptStatsExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ScriptStatsExpr.schema
  override def prettyName: String = "script_stats"

  override protected def nullSafeEval(input: Any): Any =
    ScriptKernels.scriptStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${ScriptKernels.RefName}.scriptStats($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** DEFLATE compression ratio — the Gopher-style repetitiveness signal:
  * natural prose deflates to ~0.4–0.6 of its size; templated, spun, or
  * looping text crushes far smaller, and random noise barely compresses.
  * Cheap (one zlib pass per row, scan-side) and surprisingly hard to
  * game, which is why production quality filters keep it alongside the
  * learned classifiers.
  *
  * Fixed parameters (level 6, raw deflate, one reusable per-thread
  * Deflater) so the ratio is a pure function of the bytes. zlib's output
  * is stable for a given library version; treat the ratio as a HEURISTIC
  * signal (threshold it), not a portable checksum. */
object DeflateKernels {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** deflated_bytes / raw_bytes; empty input → 1.0. */
  def ratio(t: UTF8String): Double = {
    val raw = t.getBytes
    if (raw.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var out = 0L
    val b = buf.get()
    while (!d.finished()) out += d.deflate(b)
    out.toDouble / raw.length
  }

  val RefName: String =
    classOf[DeflateKernels.type].getName.stripSuffix("$") + "$.MODULE$"
}

/** deflate_ratio(text) → double. See [[DeflateKernels]]. */
case class DeflateRatio(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernels.ratio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${DeflateKernels.RefName}.ratio($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** unicode_normalize(text, mode) → string. See [[NormKernels]]. */
case class UnicodeNormalize(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(t: Any, m: Any): Any =
    NormKernels.normalize(t.asInstanceOf[UTF8String], m.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = ${NormKernels.RefName}.normalize($t, $m);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
