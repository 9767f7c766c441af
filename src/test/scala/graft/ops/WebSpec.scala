package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** URL decomposition + registrable domain (ops.Web). */
class WebSpec extends SparkTestBase {
  import spark.implicits._

  test("parseUrl: scheme/host/domain/path/query decomposition") {
    val got = Seq(
      "https://www.example.com/a/b?x=1",
      "http://sub.shop.co.uk/",
      "https://example.com",
      "ftp://files.example.org/data.bin")
      .toDF("u").select(Web.parseUrl($"u").as("p"))
      .select("p.scheme", "p.host", "p.domain", "p.path", "p.query")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(got(0) == (("https", "www.example.com", "example.com", "/a/b", "x=1")))
    assert(got(1) == (("http", "sub.shop.co.uk", "shop.co.uk", "/", null)))
    assert(got(2) == (("https", "example.com", "example.com", "", null)))
    assert(got(3) == (("ftp", "files.example.org", "example.org", "/data.bin", null)))
  }

  test("registrableDomain: label counts and two-level suffixes") {
    val got = Seq("a.b.c.co.uk", "x.co.uk", "co.uk", "deep.www.site.com",
      "localhost").toDF("h")
      .select(Web.registrableDomain($"h")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("c.co.uk", "x.co.uk", "co.uk", "site.com",
      "localhost"))
  }

  test("capPerDomain: quota per registrable domain, WindowGroupLimit plan") {
    val df = (0L until 300L).map(i =>
      (i, s"https://${if (i % 2 == 0) "www." else ""}d${i % 5}.com/p/$i"))
      .toDF("id", "u")
    val got = Web.capPerDomain(df, $"u", $"id", maxPerDomain = 7)
    val byDom = got.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.keys.toSet == (0 until 5).map(i => s"d$i.com").toSet)
    assert(byDom.values.forall(_ == 7))
    // membership = smallest unsigned hash64(id) per domain (brute force)
    import graft.expr.TextHash
    val want = (0L until 300L).groupBy(i => s"d${i % 5}.com").toSeq.flatMap {
      case (d, ids) => ids.sortBy(i => TextHash.avalanche(i) ^ Long.MinValue)
        .take(7).map(d -> _)
    }.toSet
    assert(got.select("domain", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet == want)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("malformed URLs degrade to NULL fields, never errors") {
    val got = Seq("not a url", "", "https://").toDF("u")
      .select(Web.parseUrl($"u").as("p")).select("p.host")
      .collect().map(r => Option(r.getString(0)))
    assert(got.forall(_.isEmpty))
  }
}
