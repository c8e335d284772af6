package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sinks.HttpSink
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Salesforce Bulk-API lifecycle against a REAL in-process server (JDK
  * HttpServer — real sockets, zero egress): create job → submit batch →
  * poll batchInfo → fetch multi-chunk CSV results → stitched distributed
  * parse; plus the PK-chunked fan-out, transient-5xx retry, Failed-batch
  * and poll-timeout contracts. */
class SalesforceBulkSpec extends SparkSpec {

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Bulk API v1 sim: batches -> result-chunk CSV payloads. The query
    * batch is b0; with `pkChunked` it parks NotProcessed and the chunk
    * batches (b1..) carry the results, appearing only after `splitPolls`
    * list requests (Salesforce splits asynchronously). `flaky` makes the
    * first result-chunk request 503 once (retry path). */
  private def bulkServer(chunks: Map[String, Seq[String]],
                         pkChunked: Boolean = false,
                         splitPolls: Int = 0,
                         inProgressPolls: Int = 0,
                         flaky: Boolean = false,
                         failBatch: Option[String] = None): HttpServer = {
    val polls = new AtomicInteger(0)
    val flakes = new AtomicInteger(if (flaky) 1 else 0)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val m = ex.getRequestMethod
      // route on the path suffix from the "job" segment (the async-API
      // root prefix /services/async/{ver} is opaque to the protocol)
      val seg = path.split('/').filter(_.nonEmpty).dropWhile(_ != "job")
      // require the bulk auth header on every call
      if (ex.getRequestHeaders.getFirst("X-SFDC-Session") != "tok-123")
        respond(ex, 401, """{"err":"missing session"}""")
      else (m, seg.toList) match {
        case ("POST", "job" :: Nil) =>
          respond(ex, 200, """{"id":"j1","state":"Open"}""")
        case ("POST", "job" :: "j1" :: "batch" :: Nil) =>
          respond(ex, 200, """{"id":"b0","state":"Queued"}""")
        case ("GET", "job" :: "j1" :: "batch" :: Nil) =>
          val p = polls.incrementAndGet()
          val infos: Seq[String] =
            if (pkChunked) {
              if (p <= splitPolls) // split still running: only b0 visible
                Seq("""{"id":"b0","state":"Queued"}""")
              else
                """{"id":"b0","state":"NotProcessed"}""" +:
                  chunks.keys.toSeq.sorted.map(b =>
                    s"""{"id":"$b","state":"Completed"}""")
            } else chunks.keys.toSeq.sorted.map { b =>
              failBatch match {
                case Some(`b`) =>
                  s"""{"id":"$b","state":"Failed","stateMessage":"InvalidSoql: boom"}"""
                case _ =>
                  val st = if (p <= inProgressPolls) "InProgress" else "Completed"
                  s"""{"id":"$b","state":"$st"}"""
              }
            }
          respond(ex, 200, s"""{"batchInfo":[${infos.mkString(",")}]}""")
        case ("GET", "job" :: "j1" :: "batch" :: bid :: "result" :: Nil) =>
          val ids = chunks(bid).indices.map(i => s""""r$i"""").mkString(",")
          respond(ex, 200, s"[$ids]")
        case ("GET", "job" :: "j1" :: "batch" :: bid :: "result" :: rid :: Nil) =>
          if (flakes.getAndDecrement() > 0) respond(ex, 503, "busy")
          else respond(ex, 200, chunks(bid)(rid.stripPrefix("r").toInt))
        case ("POST", "job" :: "j1" :: Nil) =>
          respond(ex, 200, """{"id":"j1","state":"Closed"}""")
        case other =>
          respond(ex, 404, s"""{"err":"no route for $other"}""")
      }
    })
    srv.start()
    srv
  }

  private def cfg(srv: HttpServer, maxPollMs: Long = 10000) =
    SalesforceBulk.BulkConfig(
      baseUrl = s"http://127.0.0.1:${srv.getAddress.getPort}/services/async/52.0",
      sessionToken = "tok-123", pollIntervalMs = 5, maxPollMs = maxPollMs,
      http = HttpSink.HttpConfig(url = "", maxAttempts = 4,
        initialBackoffMs = 5))

  private val header = "\"Id\",\"Name\""
  private def csv(rows: Range): String =
    (header +: rows.map(i => s""""$i","acct $i"""")).mkString("\n")

  test("single batch, multi-chunk results stitch exactly once") {
    // 3 result chunks on one batch, each with its own header; 2 polls
    // of InProgress before completion; one transient 503 on a chunk
    val srv = bulkServer(
      Map("b0" -> Seq(csv(0 until 4), csv(4 until 9), csv(9 until 10))),
      inProgressPolls = 2, flaky = true)
    try {
      val df = SalesforceBulk.read(spark, cfg(srv), "Account",
        "SELECT Id, Name FROM Account")
      val got = df.collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.map(_._1.toInt).sorted.toSeq == (0 until 10))
      assert(got.toMap.apply("7") == "acct 7")
    } finally srv.stop(0)
  }

  test("PK-chunked job: NotProcessed original batch skipped, chunk batches stitched") {
    val srv = bulkServer(
      Map("b1" -> Seq(csv(0 until 5)), "b2" -> Seq(csv(5 until 8), csv(8 until 12))),
      pkChunked = true, splitPolls = 2)
    try {
      val schema = StructType(Seq(StructField("Id", StringType),
        StructField("Name", StringType)))
      val df = SalesforceBulk.read(spark, cfg(srv), "Account",
        "SELECT Id, Name FROM Account", pkChunkSize = Some(5),
        schema = Some(schema))
      assert(df.collect().map(_.getString(0).toInt).sorted.toSeq == (0 until 12))
    } finally srv.stop(0)
  }

  test("Failed batch fails loudly with the server's stateMessage") {
    val srv = bulkServer(Map("b0" -> Seq(csv(0 until 3))),
      failBatch = Some("b0"))
    try {
      val e = intercept[java.io.IOException] {
        SalesforceBulk.read(spark, cfg(srv), "Account", "SELECT bad")
      }
      assert(e.getMessage.contains("InvalidSoql"))
    } finally srv.stop(0)
  }

  test("poll timeout names the stuck states instead of hanging") {
    val srv = bulkServer(Map("b0" -> Seq(csv(0 until 3))),
      inProgressPolls = Int.MaxValue)
    try {
      val e = intercept[java.io.IOException] {
        SalesforceBulk.read(spark, cfg(srv, maxPollMs = 80), "Account", "q")
      }
      assert(e.getMessage.contains("did not complete"))
      assert(e.getMessage.contains("InProgress"))
    } finally srv.stop(0)
  }

  test("missing session token is rejected by the server (auth header rides every call)") {
    val srv = bulkServer(Map("b0" -> Seq(csv(0 until 3))))
    try {
      val bad = cfg(srv).copy(sessionToken = "")
      val e = intercept[java.io.IOException] {
        SalesforceBulk.read(spark, bad, "Account", "q")
      }
      assert(e.getMessage.contains("401"))
    } finally srv.stop(0)
  }
}
