package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("canonicalization table") {
    assert(canon(
      "HTTP://Example.COM/a?b=1#frag",
      "http://example.com/a?b=1",
      "https://example.com",
      "https://example.com/",
      "http://example.com/x?utm_source=tw&b=2&a=1&gclid=zzz",
      "http://example.com/x?a=1&b=2",
      "not a url"
    ) == Seq(
      Some("http://example.com/a?b=1"),
      Some("http://example.com/a?b=1"),
      Some("https://example.com/"),
      Some("https://example.com/"),
      Some("http://example.com/x?a=1&b=2"),
      Some("http://example.com/x?a=1&b=2"),
      None))
  }

  test("variants of one page collapse to a single dedup key") {
    val urls = Seq(
      "http://News.Site.com/story?id=7&utm_campaign=x",
      "http://news.site.com/story?utm_medium=mail&id=7",
      "http://news.site.com/story?id=7#comments")
    val keys = urls.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("k"))
      .distinct().collect()
    assert(keys.length == 1)
    assert(keys(0).getString(0) == "http://news.site.com/story?id=7")
  }

  test("suffix expansion and subdomain blocking semantics") {
    val sufs = Seq("a.b.co").toDF("h")
      .select(UrlOps.domainSuffixes(col("h"))).collect()(0)
      .getSeq[String](0)
    assert(sufs == Seq("a.b.co", "b.co", "co"))
    val df = Seq(
      "http://evil.com/x", "http://ads.evil.com/y",
      "http://notevil.com/z", "http://good.org/w").toDF("u")
    val kept = df.filter(!UrlOps.isBlockedDomain(col("u"), Seq("evil.com")))
      .as[String].collect().toSet
    assert(kept == Set("http://notevil.com/z", "http://good.org/w"))
  }

  test("join face equals the expression face and broadcasts") {
    val df = (Seq("http://evil.com/1", "http://sub.EVIL.com/2",
      "http://fine.io/3", "http://also-fine.evil.com.safe.net/4",
      "garbage") ++ (0 until 50).map(i => s"http://site$i.net/p")).toDF("u")
    val block = Seq("evil.com", "bad.org").toDF("d")
    val viaJoin = UrlOps.filterBlockedDomains(df, "u", block, "d")
    val viaExpr = df.filter(
      UrlOps.domain(col("u")).isNull ||
        !UrlOps.isBlockedDomain(col("u"), Seq("evil.com", "bad.org")))
    assert(viaJoin.as[String].collect().sorted.toSeq ==
      viaExpr.as[String].collect().sorted.toSeq)
    // unparseable rows are kept
    assert(viaJoin.filter(col("u") === "garbage").count() == 1)
    // suffix-in-the-middle must NOT block (evil.com.safe.net)
    assert(viaJoin.filter(col("u").contains("safe.net")).count() == 1)
    val plan = viaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}
