package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sources.GoogleWebmaster.{Contains, Equals, Op}

class GoogleWebmasterSpec extends SparkSpec {

  /** An in-memory "site": getPages = clicks-ranked, capped filter over
    * the page list — exactly the API contract the partitioner fights. */
  private final class FakeSite(val pages: Seq[String],
                               failFirst: Int = 0)
      extends GoogleWebmaster.WebmasterClient {
    val calls = new AtomicInteger(0)
    val maxReturned = new AtomicInteger(0)
    private val failures = new AtomicInteger(failFirst)
    private def clicks(p: String): Long = math.abs(p.hashCode.toLong) % 1000
    override def getPages(prefix: String, op: Op, rowLimit: Int): Seq[String] = {
      calls.incrementAndGet()
      if (failures.getAndDecrement() > 0)
        throw new java.io.IOException("quota exceeded")
      val hits = op match {
        case Contains => pages.filter(_.startsWith(prefix))
        case Equals => pages.filter(_ == prefix)
      }
      val out = hits.sortBy(p => (-clicks(p), p)).take(rowLimit)
      maxReturned.updateAndGet(m => math.max(m, out.size))
      out
    }
    override def analytics(ps: Seq[String]): Seq[(String, Long, Long, Double)] =
      ps.map(p => (p, clicks(p), clicks(p) * 7 + 1, (clicks(p) % 500) / 10.0))
  }

  test("recursive prefix partitioning discovers EVERY page under a tight row cap") {
    // 500 pages under a handful of hot prefixes; cap 25 forces expansion
    val pages = (0 until 500).map(i => s"site/${"abc".charAt(i % 3)}/page-$i")
    val site = new FakeSite(pages)
    val d = GoogleWebmaster.allPages(site, rootPrefix = "site/", rowLimit = 25)
    assert(d.pages.sorted == pages.sorted,
      s"missing=${(pages.toSet -- d.pages.toSet).take(3)} " +
        s"extra=${(d.pages.toSet -- pages.toSet).take(3)}")
    assert(site.maxReturned.get() <= 25, "no response may exceed the cap")
    assert(d.requests > 20, s"a capped API needs many probes: ${d.requests}")
  }

  test("a page that IS a hot prefix is caught by the EQUALS self-probe") {
    // "site/a" is itself a page AND the prefix of 30 others
    val pages = "site/a" +: (0 until 30).map(i => s"site/a$i")
    val site = new FakeSite(pages)
    val d = GoogleWebmaster.allPages(site, "site/", rowLimit = 10)
    assert(d.pages.contains("site/a"))
    assert(d.pages.sorted == pages.sorted)
  }

  test("transient failures requeue into the next round; round bound refuses loudly") {
    val pages = (0 until 40).map(i => s"s/p$i")
    val site = new FakeSite(pages, failFirst = 3)
    val d = GoogleWebmaster.allPages(site, "s/", rowLimit = 100)
    assert(d.pages.sorted == pages.sorted)
    assert(d.rounds > 1, "failed probes must be retried in later rounds")
    val e = intercept[IllegalArgumentException] {
      GoogleWebmaster.allPages(new FakeSite(pages, failFirst = 1000),
        "s/", rowLimit = 100, maxRounds = 3)
    }
    assert(e.getMessage.contains("rounds"))
  }

  test("distributed extraction equals the client's analytics for every page") {
    val pages = (0 until 200).map(i => s"s/p$i")
    val site = new FakeSite(pages)
    val got = GoogleWebmaster.extract(spark, site, pages, batchSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == site.analytics(pages).sortBy(_._1))
  }

  test("HTTP client end-to-end against an in-process endpoint") {
    val pages = (0 until 120).map(i => s"w/${"xy".charAt(i % 2)}/p$i")
    val backing = new FakeSite(pages)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/pages", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getRawQuery.split('&')
        .map(_.split("=", 2)).collect { case Array(k, v) =>
          k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      val op = if (q("op") == "equals") Equals else Contains
      val out = backing.getPages(q("prefix"), op, q("limit").toInt)
        .map(p => "\"" + p + "\"").mkString("[", ",", "]")
      val b = out.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    srv.createContext("/analytics", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      import org.json4s._
      val ps = org.json4s.jackson.JsonMethods.parse(body) match {
        case JArray(items) => items.map(_.asInstanceOf[JString].s)
        case other => sys.error(s"$other")
      }
      val out = backing.analytics(ps).map { case (p, c, i, pos) =>
        s"""{"page":"$p","clicks":$c,"impressions":$i,"position":$pos}"""
      }.mkString("[", ",", "]")
      val b = out.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    srv.start()
    try {
      val client = HttpWebmasterClient(
        s"http://127.0.0.1:${srv.getAddress.getPort}")
      val d = GoogleWebmaster.allPages(client, "w/", rowLimit = 30)
      assert(d.pages.sorted == pages.sorted)
      val got = GoogleWebmaster.extract(spark, client, d.pages, batchSize = 25)
      assert(got.count() == pages.size)
      assert(got.selectExpr("sum(clicks)").head().getLong(0) ==
        backing.analytics(pages).map(_._2).sum)
    } finally srv.stop(0)
  }
}
