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

  test("extractLinks: quoting styles, attribute order, case, non-anchors") {
    import spark.implicits._
    val html =
      """<html><body>
        |<a href="https://a.com/x">one</a>
        |<A HREF='http://b.org/y'>two</A>
        |<a class="z" data-x="1" href="https://c.net">three</a>
        |<a href="/relative">rel</a>
        |<a href="mailto:u@d.com">mail</a>
        |<link href="https://not-an-anchor.com/css">
        |<a name="no-href">anchor-less</a>
        |</body></html>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(Web.extractLinks($"h")).collect()(0).getSeq[String](0)
    assert(got == Seq("https://a.com/x", "http://b.org/y", "https://c.net",
      "/relative", "mailto:u@d.com"))
    // null html → null
    val n = Seq(Option.empty[String]).toDF("h")
      .select(Web.extractLinks($"h")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("linkGraph: domain edges, non-http dropped, parallel edges kept") {
    import spark.implicits._
    val pages = Seq(
      ("https://www.src1.com/p",
        """<a href="https://www.dst1.com/a">x</a>
          |<a href='https://cdn.dst2.co.uk/b'>y</a>
          |<a href="https://www.dst1.com/c">again</a>
          |<a href="/rel">r</a><a href="mailto:m@x.com">m</a>""".stripMargin),
      ("https://sub.src2.co.uk/q", """<a href="http://dst3.org/z">z</a>"""),
      ("https://bare/q", """<a href="https://www.dst1.com/d">w</a>""")
    ).toDF("u", "h")
    val got = Web.linkGraph(pages, $"u", $"h")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // parallel dst1 edges preserved (2 rows), suffix-aware domains
    assert(got.count(_ == ("src1.com", "dst1.com")) == 2)
    assert(got.contains(("src1.com", "dst2.co.uk")))
    assert(got.contains(("src2.co.uk", "dst3.org")))
    assert(got.contains(("bare", "dst1.com")))   // 1-label host passes through
    assert(got.length == 5)
  }

  test("linkGraph feeds pageRank end-to-end") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/1", """<a href="https://b.com/x">.</a><a href="https://c.com/x">.</a>"""),
      ("https://b.com/1", """<a href="https://c.com/x">.</a>"""),
      ("https://c.com/1", """<a href="https://a.com/x">.</a>""")
    ).toDF("u", "h")
    val edges = Web.linkGraph(pages, $"u", $"h")
    val ranks = Graph.pageRank(edges, "src_domain", "dst_domain", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.keySet == Set("a.com", "b.com", "c.com"))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-12)
    // c receives from both a and b → highest rank
    assert(ranks("c.com") > ranks("b.com"))
  }
}
