package graft.sinks

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** End-to-end HTTP/ES sink tests against an in-process JDK HttpServer —
  * real sockets, real POSTs, zero egress. */
class HttpSinkSpec extends SparkSpec {
  import spark.implicits._

  /** (server, received-bodies, url). failFirst: that many requests get a
    * 503 before the server starts accepting — exercises the retry path. */
  private def server(path: String, failFirst: Int = 0,
                     respond: String = "{\"ok\":true}")
      : (HttpServer, mutable.Buffer[String], String) = {
    val received = mutable.Buffer.empty[String]
    val failures = new AtomicInteger(failFirst)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext(path, (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val (code, resp) =
        if (failures.getAndDecrement() > 0) (503, "{\"err\":\"busy\"}")
        else {
          received.synchronized { received += body }
          (200, respond)
        }
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    (srv, received, s"http://127.0.0.1:${srv.getAddress.getPort}$path")
  }

  test("postJsonBatches delivers every row; 503s are retried") {
    val (srv, received, url) = server("/ingest", failFirst = 2)
    try {
      val df = spark.range(0, 57).selectExpr("id", "id * 2 AS v")
        .coalesce(2)
      HttpSink.postJsonBatches(df,
        HttpSink.HttpConfig(url, maxAttempts = 5, initialBackoffMs = 10),
        RecordSinks.AsyncConfig(batchSize = 10, maxInFlight = 2))
      val rows = received.synchronized {
        received.flatMap(b => "\\{\"id\":(\\d+)".r.findAllMatchIn(b)
          .map(_.group(1).toLong))
      }
      assert(rows.sorted == (0L until 57L).toSeq)
    } finally srv.stop(0)
  }

  test("a hard 4xx fails the batch without retry; failure gate trips") {
    val (srv, received, url) = server("/ingest")
    srv.removeContext("/ingest")
    srv.createContext("/ingest", (ex: HttpExchange) => {
      ex.sendResponseHeaders(400, -1); ex.close()
    })
    try {
      val df = spark.range(0, 5).toDF("id").coalesce(1)
      val e = intercept[Exception] {
        HttpSink.postJsonBatches(df,
          HttpSink.HttpConfig(url, maxAttempts = 5, initialBackoffMs = 10))
      }
      assert(e.getMessage.contains("failure ratio") ||
        e.getCause != null, s"unexpected: $e")
      assert(received.isEmpty)
    } finally srv.stop(0)
  }

  test("esBulk posts NDJSON action/doc pairs with document ids") {
    val (srv, received, url) = server("/_bulk",
      respond = "{\"took\":1,\"errors\":false,\"items\":[]}")
    try {
      val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
        .toDF("doc_id", "text").coalesce(1)
      HttpSink.esBulk(docs, HttpSink.EsConfig(
        baseUrl = url.stripSuffix("/_bulk"), index = "docs",
        idCol = Some("doc_id")))
      val body = received.synchronized(received.mkString)
      val lines = body.split('\n').filter(_.nonEmpty)
      assert(lines.length == 6) // 3 action lines + 3 doc lines
      assert(lines(0) == "{\"index\":{\"_index\":\"docs\",\"_id\":\"1\"}}")
      assert(lines(1).contains("\"text\":\"alpha\""))
      assert(lines.grouped(2).forall(_.head.startsWith("{\"index\":")))
    } finally srv.stop(0)
  }

  test("esBulk JSON-escapes document ids and survives reformatted responses") {
    // the response has whitespace around "errors" : true-style formatting
    // is NOT used here (errors:false), but ids carry quotes + backslashes
    val (srv, received, url) = server("/_bulk",
      respond = "{ \"took\" : 1, \"errors\" : false, \"items\" : [] }")
    try {
      val docs = Seq(("""he said "hi"""", "a"), ("""back\slash""", "b"))
        .toDF("key", "text").coalesce(1)
      HttpSink.esBulk(docs, HttpSink.EsConfig(
        baseUrl = url.stripSuffix("/_bulk"), index = "docs",
        idCol = Some("key")))
      val lines = received.synchronized(received.mkString)
        .split('\n').filter(_.nonEmpty)
      // every line must parse as JSON despite the hostile ids
      lines.foreach { l =>
        org.json4s.jackson.JsonMethods.parse(l): Unit
      }
      assert(lines.length == 4)
      assert(lines(0).contains("\\\"hi\\\""))
    } finally srv.stop(0)
  }

  test("esBulk fails loudly on null ids instead of losing idempotency") {
    val (srv, received, url) = server("/_bulk",
      respond = "{\"took\":1,\"errors\":false,\"items\":[]}")
    try {
      val docs = Seq((java.lang.Long.valueOf(1L), "a"),
        (null.asInstanceOf[java.lang.Long], "b"))
        .toDF("doc_id", "text").coalesce(1)
      val e = intercept[Exception] {
        HttpSink.esBulk(docs, HttpSink.EsConfig(
          baseUrl = url.stripSuffix("/_bulk"), index = "docs",
          idCol = Some("doc_id")))
      }
      def mentions(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("null id")) ||
          mentions(t.getCause))
      assert(mentions(e) || e.getMessage.contains("failure ratio"),
        s"unexpected: $e")
      assert(received.isEmpty) // the bad batch never reached the wire
    } finally srv.stop(0)
  }

  test("esBulk fails a batch on reformatted 200-with-item-errors responses") {
    val (srv, _, url) = server("/_bulk",
      respond = "{ \"took\" : 1, \"errors\" : true, \"items\" : [ " +
        "{ \"index\" : { \"status\" : 201 } }, " +
        "{ \"index\" : { \"status\" : 400 } } ] }")
    try {
      val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text").coalesce(1)
      val e = intercept[Exception] {
        HttpSink.esBulk(docs, HttpSink.EsConfig(
          baseUrl = url.stripSuffix("/_bulk"), index = "docs"))
      }
      assert(e.getMessage.contains("failure ratio") || e.getCause != null)
    } finally srv.stop(0)
  }

  test("esBulk treats 200-with-item-errors as a failed batch") {
    val (srv, _, url) = server("/_bulk",
      respond = "{\"took\":1,\"errors\":true,\"items\":[" +
        "{\"index\":{\"status\":201}},{\"index\":{\"status\":400}}]}")
    try {
      val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text").coalesce(1)
      val e = intercept[Exception] {
        HttpSink.esBulk(docs, HttpSink.EsConfig(
          baseUrl = url.stripSuffix("/_bulk"), index = "docs"))
      }
      assert(e.getMessage.contains("failure ratio") || e.getCause != null)
    } finally srv.stop(0)
  }
}
