package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audits (ops/Privacy.scala). */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // 3 classes: (a,1)x3 — k-ok, diverse; (a,2)x2 — k-violation;
  // (b,1)x4 — k-ok but sensitive constant (l-violation)
  private def fixture = Seq(
    ("a", 1, "s1"), ("a", 1, "s2"), ("a", 1, "s1"),
    ("a", 2, "s1"), ("a", 2, "s2"),
    ("b", 1, "x"), ("b", 1, "x"), ("b", 1, "x"), ("b", 1, "x"))
    .toDF("q1", "q2", "sens")

  test("audit counts classes, violations, and diversity by hand") {
    val r = Privacy.kAnonymityAudit(fixture, Seq("q1", "q2"), 3,
      Some(col("sens")), 2).head()
    assert(r.getAs[Long]("n_rows") == 9)
    assert(r.getAs[Long]("n_classes") == 3)
    assert(r.getAs[Long]("min_class_size") == 2)
    assert(r.getAs[Long]("n_violating_classes") == 1)
    assert(r.getAs[Long]("n_violating_rows") == 2)
    assert(r.getAs[Long]("min_l_diversity") == 1)
    assert(r.getAs[Long]("n_low_diversity_classes") == 1)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("k-only audit passes when every class meets k") {
    val r = Privacy.kAnonymityAudit(fixture, Seq("q1", "q2"), 2).head()
    assert(r.getAs[Long]("n_violating_classes") == 0)
    assert(r.getAs[Boolean]("passes"))
  }

  test("suppression drops exactly the violating classes' rows") {
    val out = Privacy.suppressViolations(fixture, Seq("q1", "q2"), 3)
    assert(out.count() == 7) // the (a,2) pair suppressed
    assert(out.where(col("q1") === "a" && col("q2") === 2).count() == 0)
    // repaired data audits clean at k=3
    val r = Privacy.kAnonymityAudit(out, Seq("q1", "q2"), 3).head()
    assert(r.getAs[Boolean]("passes"))
  }

  test("NULL quasi values form real classes and survive suppression") {
    val df = Seq(
      (Some("a"), "s1"), (Some("a"), "s2"), (Some("a"), "s3"),
      (None, "t1"), (None, "t2"), (None, "t3"),
      (Some("z"), "u1"))
      .toDF("q1", "sens")
    val kept = Privacy.suppressViolations(df, Seq("q1"), 3)
    assert(kept.count() == 6) // NULL class of 3 kept; lone z dropped
    assert(kept.where(col("q1").isNull).count() == 3)
  }

  test("NULL sensitive values count as a distinct value in l-diversity") {
    val df = Seq(
      (("a"), Option("x")), (("a"), None), // {x, NULL} → diversity 2
      (("b"), None), (("b"), None),        // {NULL}    → diversity 1
      (("c"), Option("x")), (("c"), Option("y"))) // {x, y} → diversity 2
      .toDF("q1", "sens")
    val got = Privacy.equivalenceClasses(df, Seq("q1"), Some(col("sens")))
      .orderBy("q1").collect()
      .map(r => (r.getString(0), r.getAs[Long]("l_diversity"))).toList
    assert(got == List(("a", 2L), ("b", 1L), ("c", 2L)))
    // audit at l=2: only the all-NULL class is low-diversity
    val r = Privacy.kAnonymityAudit(df, Seq("q1"), 1, Some(col("sens")), 2)
      .head()
    assert(r.getAs[Long]("min_l_diversity") == 1)
    assert(r.getAs[Long]("n_low_diversity_classes") == 1)
  }

  test("empty input audits as vacuously passing with zero counts") {
    val r = Privacy.kAnonymityAudit(fixture.where(lit(false)),
      Seq("q1"), 5).head()
    assert(r.getAs[Long]("n_rows") == 0 && r.getAs[Boolean]("passes"))
  }
}
