package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII scan/redaction kernels for training-data pipelines.
  *
  * Patterns are deliberately restricted to a regex subset on which Java's
  * backtracking engine and RE2 (the DuckDB oracle) produce identical
  * non-overlapping leftmost-greedy matches: character classes, bounded
  * counted repetition, one optional non-capturing group — no alternation
  * whose branches overlap, no backreferences, no lookaround. Patterns are
  * compiled once per JVM; matching allocates only the matcher.
  *
  * Counts are computed independently per category on the raw text;
  * redaction applies email → phone → IPv4 in that fixed order (replacement
  * tokens contain no digits or '@', so later passes can't re-match them).
  */
object PiiKernels {
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String =
    "\\+\\d{1,3}[-. ]\\d{3,4}[-. ]\\d{3,4}(?:[-. ]\\d{3,4})?"
  val Ipv4Pattern: String =
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  private val email = Pattern.compile(EmailPattern)
  private val phone = Pattern.compile(PhonePattern)
  private val ipv4 = Pattern.compile(Ipv4Pattern)

  private def count(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def piiStats(t: UTF8String): GenericInternalRow = {
    val s = t.toString
    val row = new GenericInternalRow(3)
    row.setInt(0, count(email, s))
    row.setInt(1, count(phone, s))
    row.setInt(2, count(ipv4, s))
    row
  }

  def redact(t: UTF8String): UTF8String = {
    var s = t.toString
    s = email.matcher(s).replaceAll("<EMAIL>")
    s = phone.matcher(s).replaceAll("<PHONE>")
    s = ipv4.matcher(s).replaceAll("<IP>")
    UTF8String.fromString(s)
  }

  private def tokenize(p: Pattern, s: String, label: String): String = {
    val m = p.matcher(s)
    val sb = new StringBuffer
    while (m.find()) {
      val bytes = m.group()
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = graft.expr.TextHash.hashBytes(bytes, 0, bytes.length, 0L)
      val tok = f"<${label}_${(h & 0xFFFFL).toInt}%04x>"
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(tok))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Pseudonymize instead of redact: every PII match becomes a
    * DETERMINISTIC entity token `<EMAIL_xxxx>` / `<PHONE_xxxx>` /
    * `<IP_xxxx>` derived from the low 16 bits of the engine's string
    * hash64 (FNV-1a + avalanche — the same pipeline an external oracle
    * mirrors), so the same address maps to the same token EVERYWHERE in
    * the corpus: referential integrity survives anonymization ("the same
    * user appears in 40 docs" stays learnable; a plain <EMAIL> redaction
    * destroys it). 16-bit ids are a privacy/utility knob, not identity —
    * collisions are expected and acceptable for training text. Passes run
    * email → phone → IP on the running result, exactly as [[redact]]. */
  def pseudonymize(t: UTF8String): UTF8String = {
    var s = t.toString
    s = tokenize(email, s, "EMAIL")
    s = tokenize(phone, s, "PHONE")
    s = tokenize(ipv4, s, "IP")
    UTF8String.fromString(s)
  }

  /** Java-reachable name of this object for generated code. */
  val RefName: String =
    classOf[PiiKernels.type].getName.stripSuffix("$") + "$.MODULE$"
}

object PiiStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_ipv4", IntegerType, nullable = false)))
}

/** pii_stats(text) → struct{n_emails, n_phones, n_ipv4}: per-category
  * non-overlapping match counts over the raw text. */
case class PiiStatsExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = PiiStatsExpr.schema
  override def prettyName: String = "pii_stats"

  override protected def nullSafeEval(input: Any): Any =
    PiiKernels.piiStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${PiiKernels.RefName}.piiStats($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** redact_pii(text) → string: emails, then phones, then IPv4 addresses
  * replaced with `<EMAIL>`/`<PHONE>`/`<IP>` tokens. */
case class RedactPii(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "redact_pii"

  override protected def nullSafeEval(input: Any): Any =
    PiiKernels.redact(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${PiiKernels.RefName}.redact($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** pseudonymize_pii(text) → string: PII replaced with deterministic
  * hash-derived entity tokens (see [[PiiKernels.pseudonymize]]) —
  * referential integrity survives anonymization. */
case class PseudonymizePii(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "pseudonymize_pii"

  override protected def nullSafeEval(input: Any): Any =
    PiiKernels.pseudonymize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${PiiKernels.RefName}.pseudonymize($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
