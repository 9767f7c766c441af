package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.api.{functions => gf}

/** rep_stats repetition signals + PII scan/redaction, verified against
  * hand-computed values and brute-force Scala recomputation. */
class TextSignalsSpec extends SparkTestBase {
  import spark.implicits._

  private def rep(text: String, n: Int): Row =
    Seq(text).toDF("t").select(gf.rep_stats(col("t"), n).as("r"))
      .select("r.*").head()

  test("rep_stats: hand-computed bigram repetition") {
    // tokens [a b a b]; bigrams: "a b"×2 (len 3), "b a"×1 (len 3);
    // text chars = 7; one line, no duplicate lines
    val r = rep("a b a b", 2)
    assert(r.getInt(0) == 1)                      // n_lines
    assert(r.getDouble(1) == 0.0)                 // dup_line_fraction
    assert(r.getDouble(2) == 0.0)                 // dup_line_char_fraction
    assert(r.getDouble(3) == 6.0 / 7)             // top: 2 × len("a b")=3
    assert(r.getDouble(4) == 6.0 / 7)             // dup: only "a b" repeats
  }

  test("rep_stats: duplicate lines") {
    // lines [xy, z, xy]: 3 lines, 2 distinct; line chars 2+1+2 = 5, the
    // repeat occurrence has 2 chars
    val r = rep("xy\nz\nxy", 1)
    assert(r.getInt(0) == 3)
    assert(r.getDouble(1) == 1.0 / 3)
    assert(r.getDouble(2) == 2.0 / 5)
    // unigrams: xy×2 (len 2), z×1 (len 1); text chars = 7 (incl. newlines)
    assert(r.getDouble(3) == 4.0 / 7)
    assert(r.getDouble(4) == 4.0 / 7)
  }

  test("rep_stats: empty and degenerate inputs") {
    val e = rep("", 2)
    assert(e.getInt(0) == 1 && e.getDouble(1) == 0.0 && e.getDouble(2) == 0.0 &&
      e.getDouble(3) == 0.0 && e.getDouble(4) == 0.0)
    val one = rep("solo", 2) // 1 token < n: no grams
    assert(one.getDouble(3) == 0.0 && one.getDouble(4) == 0.0)
    val ws = rep("   ", 2) // whitespace-only: 0 tokens, 1 line of 3 chars
    assert(ws.getInt(0) == 1 && ws.getDouble(3) == 0.0)
  }

  test("rep_stats: multi-byte chars counted as code points") {
    // "é é é": 3 tokens of 1 char; bigram "é é" (3 chars) × 2; text = 5 chars
    val r = rep("é é é", 2)
    assert(r.getDouble(3) == 6.0 / 5)  // mass can exceed 1 on overlap
    assert(r.getDouble(4) == 6.0 / 5)
  }

  test("rep_stats: trailing newline yields empty last line (SQL split parity)") {
    val r = rep("x\n", 1)
    assert(r.getInt(0) == 2) // ["x", ""]
    assert(r.getDouble(1) == 0.0)
  }

  private def pii(text: String): (Row, String) = {
    val df = Seq(text).toDF("t")
      .select(gf.pii_stats(col("t")).as("p"), gf.redact_pii(col("t")).as("r"))
    val h = df.head()
    (h.getStruct(0), h.getString(1))
  }

  test("pii_stats and redact_pii: all three categories") {
    val (st, red) = pii(
      "mail a.b+c@sub.example.org or admin@x.io, call +1-555-0199 " +
      "or +44 207 946 0958, host 192.168.0.1 end")
    assert(st.getInt(0) == 2, "emails")
    assert(st.getInt(1) == 2, "phones")
    assert(st.getInt(2) == 1, "ipv4")
    assert(red == "mail <EMAIL> or <EMAIL>, call <PHONE> " +
      "or <PHONE>, host <IP> end")
  }

  test("pii: counts are independent of redaction order (IP inside email)") {
    val (st, red) = pii("x 10.0.0.1@host.com y")
    // the email match consumes the IP text, but counts run per-category
    // on the raw string
    assert(st.getInt(0) == 1 && st.getInt(2) == 1)
    assert(red == "x <EMAIL> y")
  }

  test("pseudonymize_pii: deterministic hash tokens, referential integrity") {
    def ps(t: String): String = Seq(t).toDF("t")
      .select(gf.pseudonymize_pii(col("t"))).head().getString(0)
    // hand-compute the expected email token from the engine hash
    val b = "a@b.io".getBytes("UTF-8")
    val h = graft.expr.TextHash.hashBytes(b, 0, b.length, 0L)
    val tok = f"<EMAIL_${(h & 0xFFFFL).toInt}%04x>"
    assert(ps("mail a@b.io now") == s"mail $tok now")
    // SAME address -> SAME token, everywhere, incl. across category mix
    val out = ps("a@b.io wrote to c@d.io then a@b.io pinged 10.0.0.1")
    val toks = "<EMAIL_[0-9a-f]{4}>".r.findAllIn(out).toSeq
    assert(toks.length == 3 && toks(0) == tok && toks(2) == tok &&
      toks(1) != tok)
    assert("<IP_[0-9a-f]{4}>".r.findAllIn(out).size == 1)
    // token lengths are fixed per category (12 / 12 / 9)
    assert(ps("x 1.2.3.4 y").length == "x ".length + 9 + " y".length)
    // null-safe + SQL path
    val r = spark.sql("SELECT pseudonymize_pii(NULL) n, " +
      "pseudonymize_pii('call +1-555-0100 ok') p").head()
    assert(r.isNullAt(0) &&
      r.getString(1).matches("call <PHONE_[0-9a-f]{4}> ok"))
  }

  test("pii: no false positives on plain text and bare numbers") {
    val (st, red) = pii("version 1.2.3 of spark at 3.5 runs 12345 rows")
    assert(st.getInt(0) == 0 && st.getInt(1) == 0 && st.getInt(2) == 0)
    assert(red == "version 1.2.3 of spark at 3.5 runs 12345 rows")
  }

  test("pii: null-safe and SQL-registered") {
    val r = spark.sql(
      "SELECT pii_stats(NULL) AS p, redact_pii(NULL) AS r, " +
      "pii_stats('a@b.io x').n_emails AS ne").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getInt(2) == 1)
    val rs = spark.sql("SELECT rep_stats('a b a b', 2).top_ngram_char_fraction AS f").head()
    assert(rs.getDouble(0) == 6.0 / 7)
  }

  test("rep_stats matches brute-force recomputation on fixture docs") {
    val docs = spark.read.parquet(sf("documents")).select("doc_id", "text")
      .where(col("doc_id") < 60)
    val got = docs.select(col("doc_id"), gf.rep_stats(col("text"), 2).as("r"))
      .select(col("doc_id"), col("r.top_ngram_char_fraction"), col("r.dup_ngram_char_fraction"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    docs.collect().foreach { row =>
      val (id, text) = (row.getLong(0), row.getString(1))
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val total = text.codePointCount(0, text.length)
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val top = if (grams.isEmpty || total == 0) 0.0
        else counts.map { case (g, c) => c.toLong * g.length }.max.toDouble / total
      val dup = if (total == 0) 0.0
        else counts.collect { case (g, c) if c >= 2 => c.toLong * g.length }.sum.toDouble / total
      assert(math.abs(got(id)._1 - top) < 1e-12, s"top mismatch doc $id")
      assert(math.abs(got(id)._2 - dup) < 1e-12, s"dup mismatch doc $id")
    }
  }

  private def entropy(text: String): Double =
    Seq(text).toDF("t").select(gf.char_entropy(col("t")))
      .head().getDouble(0)

  test("char_entropy: hand-computed values") {
    assert(entropy("aaaa") == 0.0)
    assert(entropy("ab") == 1.0)
    assert(entropy("abcd") == 2.0)
    assert(entropy("aabb") == 1.0)
    assert(entropy("") == 0.0)
    // 256 distinct bytes impossible in a short ASCII test; 8 distinct
    // equiprobable chars → exactly 3 bits
    assert(entropy("abcdefgh") == 3.0)
  }

  test("char_entropy: byte-level on multi-byte UTF-8, null-safe, SQL path") {
    // "é" is 2 bytes (0xC3 0xA9): two distinct bytes → 1 bit/byte
    assert(entropy("é") == 1.0)
    val r = Seq((1L, "abab"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .selectExpr("id", "char_entropy(t) AS e")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) == 1.0)
    assert(r(2L) == null)
  }

  test("char_entropy matches an independent reference on fixture docs") {
    val docs = spark.read.parquet(sf("documents")).limit(50)
    val got = docs.select(col("doc_id"), gf.char_entropy(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = docs.select("doc_id", "text").collect().map { r =>
      val bs = r.getString(1).getBytes("UTF-8")
      val cnt = bs.groupBy(identity).view.mapValues(_.length).values
      val n = bs.length.toDouble
      val h = cnt.map(c => -c / n * (math.log(c / n) / math.log(2))).sum
      r.getLong(0) -> h
    }.toMap
    got.foreach { case (id, v) =>
      assert(math.abs(v - ref(id)) < 1e-9, s"doc $id: $v vs ${ref(id)}")
    }
    // English-ish word salad sits in the 3.5-4.5 bits/byte band
    assert(got.values.forall(v => v > 3.0 && v < 5.0))
  }

  test("char_entropy is codegen'd (no CodegenFallback in the plan)") {
    val df = spark.read.parquet(sf("documents")).limit(10)
      .select(gf.char_entropy(col("text")).as("e"))
    df.collect()
    // the starred stage marker is whole-stage codegen in the compact plan
    // string; a fallback expression would both unstar the Project and name
    // CodegenFallback
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("char_entropy") && l.contains("*(")), plan)
  }

  test("repeatedNgramRate: loops score high, unique text scores 0") {
    import spark.implicits._
    val df = Seq(
      ("a b c a b c a b",      // 2-grams: 7 total, 3 distinct
        "loop"),
      ("a b c d e", "clean"),  // all distinct
      ("a", "short"))          // < n tokens: nothing can repeat
      .toDF("text", "tag")
    val got = df.select(col("tag"),
        Text.repeatedNgramRate(col("text"), 2).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("loop") - (1.0 - 3.0 / 7.0)) < 1e-15)
    assert(got("clean") == 0.0)
    assert(got("short") == 0.0)
  }

  test("watermarkStats: census matches the hash rule exactly") {
    import spark.implicits._
    val df = Seq(("g", "w1 w2 w3 w4"), ("g", "x1 x2"), ("g", "solo"))
      .toDF("grp", "text")
    val r = Text.watermarkStats(df, Seq("grp"), col("text"))
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_docs")) == 2L) // solo drops
    assert(r.getLong(r.fieldIndex("n_bigrams")) == 4L)
    // recompute greens independently with the engine's own hash
    val greens = df.where(size(split(col("text"), " ")) >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(split(text, ' '))), " +
          "i -> concat(element_at(split(text, ' '), i - 1), ':', " +
          "element_at(split(text, ' '), i)))")).as("bg"))
      .select(graft.api.functions.hash64(col("bg")).as("h"))
      .collect().count(x => ((x.getLong(0) % 2) + 2) % 2 == 0)
    assert(r.getLong(r.fieldIndex("n_green")) == greens.toLong)
  }
}
