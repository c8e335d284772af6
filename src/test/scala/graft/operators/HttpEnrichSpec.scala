package graft.operators

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.operators.HttpEnrich._
import org.apache.spark.sql.functions._

class HttpEnrichSpec extends SparkSpec {

  /** Lookup endpoint: GET /seg?name=X → lowercase(X); /miss → 404;
    * /boom → 500. Tracks the high-water concurrent request count. */
  private final class LookupSim extends AutoCloseable {
    private val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    srv.setExecutor(pool)
    val inFlight = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var maxInFlight = 0
    val posts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def baseUrl: String = s"http://127.0.0.1:${srv.getAddress.getPort}"

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    srv.createContext("/", (ex: HttpExchange) => {
      val n = inFlight.incrementAndGet()
      synchronized { maxInFlight = math.max(maxInFlight, n) }
      try {
        Thread.sleep(20) // makes pipelining observable
        val path = ex.getRequestURI.getPath
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        if (path == "/seg") {
          val name = java.net.URLDecoder.decode(
            q.stripPrefix("name="), "UTF-8")
          respond(ex, 200, name.toLowerCase)
        } else if (path == "/post") {
          posts.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          respond(ex, 200, "ok")
        } else if (path == "/miss") respond(ex, 404, "no such key")
        else respond(ex, 500, "kaboom")
      } finally inFlight.decrementAndGet()
    })
    srv.start()
    override def close(): Unit = { srv.stop(0); pool.shutdownNow(); () }
  }

  test("per-record GET joins status + body onto the record; values URL-encode") {
    import spark.implicits._
    val sim = new LookupSim
    try {
      val df = Seq((1L, "BUILDING"), (2L, "AUTO MOBILE"), (3L, "MACHINERY"))
        .toDF("id", "seg")
      val out = HttpEnrich.enrich(df, EnrichConfig(
        s"${sim.baseUrl}/seg?name=$${seg}"))
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
      assert(out.toSet == Set((1L, 200, "building"),
        (2L, 200, "auto mobile"), // space URL-encoded, decoded server-side
        (3L, 200, "machinery")))
    } finally sim.close()
  }

  test("bounded in-flight pipelining actually overlaps requests") {
    import spark.implicits._
    val sim = new LookupSim
    try {
      val df = (1 to 40).map(i => (i.toLong, s"S$i")).toDF("id", "seg")
        .coalesce(1) // one partition -> observed concurrency == maxInFlight
      HttpEnrich.enrich(df, EnrichConfig(
        s"${sim.baseUrl}/seg?name=$${seg}", maxInFlight = 6)).count()
      assert(sim.maxInFlight > 1, "requests must pipeline")
      assert(sim.maxInFlight <= 6,
        s"in-flight bound exceeded: ${sim.maxInFlight}")
    } finally sim.close()
  }

  test("POST renders the body template raw; 404 joins null; 500 fails the task") {
    import spark.implicits._
    val sim = new LookupSim
    try {
      val df = Seq((7L, "alpha")).toDF("id", "seg")
      HttpEnrich.enrich(df, EnrichConfig(s"${sim.baseUrl}/post",
        verb = "POST",
        bodyTemplate = Some("""{"id":${id},"seg":"${seg}"}"""))).count()
      assert(sim.posts.peek() == """{"id":7,"seg":"alpha"}""")
      // CLIENT_ERROR default: join a null body, keep the status
      val miss = HttpEnrich.enrich(df, EnrichConfig(s"${sim.baseUrl}/miss"))
        .collect()(0)
      assert(miss.getInt(2) == 404 && miss.isNullAt(3))
      // SERVER_ERROR default: fail the task, loudly
      val e = intercept[Exception] {
        HttpEnrich.enrich(df, EnrichConfig(s"${sim.baseUrl}/boom")).count()
      }
      def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null).map(x => String.valueOf(x.getMessage))
        .mkString("; ")
      assert(msgs(e).contains("HTTP 500"), msgs(e))
    } finally sim.close()
  }

  test("unknown template columns refuse at plan time") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "seg")
    val e = intercept[IllegalArgumentException] {
      HttpEnrich.enrich(df, EnrichConfig("http://h/${nope}/${seg}"))
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    // a ${...} the grammar can't match would survive render literally —
    // refuse at plan time, not per-record on executors
    val e2 = intercept[IllegalArgumentException] {
      HttpEnrich.enrich(df, EnrichConfig("http://h/${bad-name}"))
    }
    assert(e2.getMessage.contains("malformed placeholder"), e2.getMessage)
    // pre-existing output columns would produce a duplicate-name schema
    val e3 = intercept[IllegalArgumentException] {
      HttpEnrich.enrich(df.withColumn("http_status", lit(1)),
        EnrichConfig("http://h/${seg}"))
    }
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
  }

  test("a NULL lookup key null-joins instead of querying for the string 'null'") {
    import spark.implicits._
    val sim = new LookupSim
    try {
      val df = Seq((1L, "REAL"), (2L, null.asInstanceOf[String]))
        .toDF("id", "seg")
      val out = HttpEnrich.enrich(df, EnrichConfig(
        s"${sim.baseUrl}/seg?name=$${seg}"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(2)) null else r.getInt(2).toString,
          r.getString(3))).toSet
      assert(out == Set((1L, "200", "real"), (2L, null, null)), out.toString)
    } finally sim.close()
  }
}
