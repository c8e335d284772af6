package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sinks.HttpSink

/** The REST source's pluggable fetch seam, driven by a REAL HTTP
  * pagination endpoint (in-process JDK server — real sockets, no
  * egress): cursored pages, retried 503s, chunk-spilled staging. */
class RestHttpFetcherSpec extends SparkSpec {

  private val pageSize = 7
  private val total = 53 // 8 pages, last one short

  test("httpFetcher paginates a cursored JSON API to the last page") {
    val failures = new AtomicInteger(2) // first two requests get a 503
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/api/items", (ex: HttpExchange) => {
      val resp =
        if (failures.getAndDecrement() > 0) (503, "{\"err\":\"busy\"}")
        else {
          val cursor = ex.getRequestURI.getQuery.stripPrefix("cursor=").toInt
          val ids = (cursor until math.min(cursor + pageSize, total))
          val recs = ids.map(i => s"""{"id":$i,"name":"item$i"}""")
            .mkString("[", ",", "]")
          val next =
            if (cursor + pageSize >= total) "null"
            else (cursor + pageSize).toString
          (200, s"""{"records":$recs,"next":$next}""")
        }
      val bytes = resp._2.getBytes("UTF-8")
      ex.sendResponseHeaders(resp._1, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}/api/items"
      val fetch = RestSource.httpFetcher(
        cursor => s"$url?cursor=$cursor",
        http = HttpSink.HttpConfig(url = "", maxAttempts = 5,
          initialBackoffMs = 10))
      val df = RestSource.read(spark, fetch, flushEveryPages = 2)
      val rows = df.selectExpr("id").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L until total.toLong).toSeq)
      assert(df.columns.sorted.toSeq == Seq("id", "name"))
    } finally srv.stop(0)
  }

  test("JSON-quoted numeric cursors paginate; opaque cursors fail loudly") {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/quoted", (ex: HttpExchange) => {
      val cursor = ex.getRequestURI.getQuery.stripPrefix("cursor=").toInt
      val body = // cursor serialized as a JSON string, as many APIs do
        if (cursor >= 2) s"""{"records":[{"id":$cursor}],"next":null}"""
        else s"""{"records":[{"id":$cursor}],"next":"${cursor + 1}"}"""
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.createContext("/opaque", (ex: HttpExchange) => {
      val body = """{"records":[{"id":1}],"next":"abc-token"}"""
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val quoted = RestSource.httpFetcher(c => s"$base/quoted?cursor=$c")
      assert(RestSource.read(spark, quoted).count() == 3)
      val opaque = RestSource.httpFetcher(_ => s"$base/opaque")
      val e = intercept[IllegalArgumentException] {
        RestSource.read(spark, opaque)
      }
      assert(e.getMessage.contains("non-numeric"))
    } finally srv.stop(0)
  }

  test("absent, empty-string and false 'next' values all terminate cleanly") {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def ctx(path: String, body: String): Unit = {
      srv.createContext(path, (ex: HttpExchange) => {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }): Unit
    }
    ctx("/absent", """{"records":[{"id":1}]}""")
    ctx("/empty", """{"records":[{"id":2}],"next":""}""") // Slack-style
    ctx("/bool", """{"records":[{"id":3}],"next":false}""") // has-more flag
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      Seq("/absent", "/empty", "/bool").foreach { p =>
        val fetch = RestSource.httpFetcher(_ => s"$base$p")
        assert(RestSource.read(spark, fetch).count() == 1, s"path $p")
      }
    } finally srv.stop(0)
  }
}
