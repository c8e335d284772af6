package graft.metrics

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, ServerSocket}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Reporter e2e tests against in-process servers — a real TCP listener
  * for graphite plaintext, a real JDK HttpServer for the influx /write
  * endpoint. Real sockets, zero egress. */
class ReportersSpec extends SparkSpec {

  private def sampleRecords = Seq(
    MetricRecord("job.source", "records.read", "counter", 100),
    MetricRecord("job.branch.b", "bytes.written", "counter", 2048),
    MetricRecord("job", "time.write.count", "timer", 1))

  test("graphite line format matches the plaintext protocol") {
    val lines = MetricReporter.graphiteLines(sampleRecords, 1700000000L, "graft")
    assert(lines.head == "graft.job.source.records.read 100 1700000000")
    assert(lines(1) == "graft.job.branch.b.bytes.written 2048 1700000000")
  }

  test("influx line protocol carries tags, integer value, ns timestamp") {
    val lines = MetricReporter.influxLines(sampleRecords, 1700000000L, "graft")
    assert(lines.head == "graft,context=job.source,metric=records.read," +
      "kind=counter value=100i 1700000000000000000")
  }

  test("GraphiteReporter pushes over a real TCP socket") {
    val srv = new ServerSocket()
    srv.bind(new InetSocketAddress("127.0.0.1", 0))
    val got = mutable.Buffer.empty[String]
    val latch = new CountDownLatch(3)
    val acceptor = new Thread(() => {
      val sock = srv.accept()
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, "UTF-8"))
      var line = in.readLine()
      while (line != null && latch.getCount > 0) {
        got.synchronized { got += line }
        latch.countDown()
        line = if (latch.getCount == 0) null else in.readLine()
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    val rep = new GraphiteReporter("127.0.0.1", srv.getLocalPort, "graft")
    try {
      rep.report(sampleRecords, 1700000000L)
      assert(latch.await(10, TimeUnit.SECONDS), "graphite lines not received")
      val lines = got.synchronized(got.toList)
      assert(lines.contains("graft.job.source.records.read 100 1700000000"))
      assert(lines.contains("graft.job.branch.b.bytes.written 2048 1700000000"))
    } finally { rep.close(); srv.close() }
  }

  test("InfluxDbReporter POSTs one line-protocol batch; 503 retried") {
    val received = mutable.Buffer.empty[String]
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/write", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val code = if (failures.getAndDecrement() > 0) 503
      else { received.synchronized { received += body }; 204 }
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    srv.start()
    try {
      val rep = new InfluxDbReporter(
        s"http://127.0.0.1:${srv.getAddress.getPort}/write")
      rep.report(sampleRecords, 1700000000L)
      val bodies = received.synchronized(received.toList)
      assert(bodies.size == 1)
      val lines = bodies.head.split('\n')
      assert(lines.length == 3)
      assert(lines.head.startsWith("graft,context=job.source"))
    } finally srv.stop(0)
  }

  test("ScheduledMetricReporter pumps live snapshots and flushes on close") {
    val ctx = MetricContext.root("sched-job")
    val reports = mutable.Buffer.empty[Seq[MetricRecord]]
    val rep = new MetricReporter {
      override def report(rs: Seq[MetricRecord], ts: Long): Unit =
        reports.synchronized { reports += rs }
    }
    val sched = new ScheduledMetricReporter(ctx, rep, periodMs = 50)
    ctx.counter("records.read").inc(5)
    sched.start()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (reports.synchronized(reports.isEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(reports.synchronized(reports.nonEmpty), "no scheduled report")
      ctx.counter("records.read").inc(3)
    } finally sched.close()
    // close() pushed a final snapshot carrying the post-start increment
    val last = reports.synchronized(reports.last)
    assert(last.exists(r => r.metric == "records.read" && r.value == 8))
  }

  test("a failing report does not kill the schedule") {
    val ctx = MetricContext.root("flaky-job")
    ctx.counter("n").inc()
    val calls = new java.util.concurrent.atomic.AtomicInteger()
    val rep = new MetricReporter {
      override def report(rs: Seq[MetricRecord], ts: Long): Unit =
        if (calls.incrementAndGet() == 1)
          throw new java.io.IOException("backend down")
    }
    val sched = new ScheduledMetricReporter(ctx, rep, periodMs = 30).start()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (calls.get() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      assert(calls.get() >= 3, "schedule stopped after a failed report")
    } finally sched.close()
  }
}
