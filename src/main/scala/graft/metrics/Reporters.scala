package graft.metrics

import java.io.{BufferedWriter, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/** Metric reporters — the reference's reporter modules re-expressed over
  * [[MetricContext]] snapshots (gobblin-modules/gobblin-metrics-graphite/
  * .../GraphiteReporter.java:52 — codahale plaintext lines
  * `name value timestamp` pushed over a TCP sender;
  * gobblin-modules/gobblin-metrics-influxdb/.../InfluxDBReporter.java —
  * line-protocol points POSTed to /write; both run as
  * ConfiguredScheduledReporters on a fixed period).
  *
  * Reporters are driver-side and O(metrics) per report — they never see
  * record data, only the context tree's counters/gauges/timers, so
  * reporting cost is independent of job scale. Failures are the
  * caller's to police: [[ScheduledMetricReporter]] logs and keeps the
  * schedule (a flaky metrics backend must not take down ingestion, the
  * reference's reporters behave the same), while a direct `report()`
  * call propagates.
  */
trait MetricReporter extends AutoCloseable {
  /** Push one snapshot; `timestampSec` is the report's epoch-seconds. */
  def report(records: Seq[MetricRecord], timestampSec: Long): Unit
  override def close(): Unit = ()
}

object MetricReporter {

  /** Graphite plaintext: one `prefix.context.metric value timestamp`
    * line per record (GraphiteReporter.java:197-205 key shape; counters
    * get the `.count` suffix there — our flat records already carry
    * their kind-specific suffixes). Spaces in name parts are sanitized
    * the way codahale's sender does (replaced with `-`). */
  def graphiteLines(records: Seq[MetricRecord], timestampSec: Long,
                    prefix: String): Seq[String] =
    records.map { r =>
      val name = Seq(prefix, r.context, r.metric).filter(_.nonEmpty)
        .mkString(".").replace(' ', '-')
      s"$name ${r.value} $timestampSec"
    }

  /** InfluxDB line protocol: `measurement,context=...,kind=... value=<v>i <ns>`
    * (InfluxDBReporter emits one point per metric the same way). */
  def influxLines(records: Seq[MetricRecord], timestampSec: Long,
                  measurement: String): Seq[String] =
    records.map { r =>
      def esc(s: String) = s.replace(" ", "\\ ").replace(",", "\\,")
        .replace("=", "\\=")
      s"${esc(measurement)},context=${esc(r.context)}," +
        s"metric=${esc(r.metric)},kind=${esc(r.kind)} " +
        s"value=${r.value}i ${timestampSec * 1000000000L}"
    }
}

/** Pushes graphite plaintext over a real TCP connection. Connects
  * lazily, reconnects after an IO failure on the next report (the
  * codahale TCP sender the reference wraps does the same). */
final class GraphiteReporter(host: String, port: Int,
                             prefix: String = "graft")
    extends MetricReporter {
  private var socket: Option[Socket] = None

  private def writer(): (Socket, BufferedWriter) = {
    val s = socket.filter(s => s.isConnected && !s.isClosed).getOrElse {
      val ns = new Socket()
      ns.connect(new InetSocketAddress(host, port), 10000)
      socket = Some(ns)
      ns
    }
    (s, new BufferedWriter(
      new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)))
  }

  override def report(records: Seq[MetricRecord], timestampSec: Long): Unit = {
    val (s, w) = writer()
    try {
      MetricReporter.graphiteLines(records, timestampSec, prefix)
        .foreach { l => w.write(l); w.write('\n') }
      w.flush()
    } catch { case e: java.io.IOException =>
      // drop the broken connection so the next report reconnects
      try s.close() catch { case _: java.io.IOException => }
      socket = None
      throw e
    }
  }

  override def close(): Unit = {
    socket.foreach(s => try s.close() catch { case _: java.io.IOException => })
    socket = None
  }
}

/** POSTs line-protocol batches to an InfluxDB-style `/write` endpoint,
  * one request per report, reusing the engine's bounded-retry HTTP
  * plumbing (5xx/429 retried, 4xx fail fast — same policy as the HTTP
  * record sink). */
final class InfluxDbReporter(writeUrl: String,
                             measurement: String = "graft",
                             maxAttempts: Int = 3)
    extends MetricReporter {
  private val client = java.net.http.HttpClient.newHttpClient()
  private val cfg = graft.sinks.HttpSink.HttpConfig(
    url = writeUrl, maxAttempts = maxAttempts)

  override def report(records: Seq[MetricRecord], timestampSec: Long): Unit = {
    val body = MetricReporter
      .influxLines(records, timestampSec, measurement).mkString("\n")
    graft.sinks.HttpSink.send(client, cfg, "POST", Some(body)): Unit
  }
}

/** Fixed-period snapshot pump: every `periodMs`, snapshot the context
  * tree recursively and push it. Report failures are logged and the
  * schedule continues — metrics must never fail the job. */
final class ScheduledMetricReporter(ctx: MetricContext,
                                    reporter: MetricReporter,
                                    periodMs: Long,
                                    clock: () => Long = () =>
                                      System.currentTimeMillis())
    extends AutoCloseable {
  private val exec: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, s"graft-metrics-report-${ctx.name}")
      t.setDaemon(true); t
    }

  /** One immediate synchronous report (also handy for tests/shutdown). */
  def reportNow(): Unit =
    reporter.report(ctx.snapshotRecursive(), clock() / 1000L)

  def start(): this.type = {
    exec.scheduleAtFixedRate(() =>
      try reportNow() catch { case e: Exception =>
        System.err.println(s"[graft] metric report failed (non-fatal): $e")
      }, periodMs, periodMs, TimeUnit.MILLISECONDS)
    this
  }

  /** Stop the schedule, push one final snapshot, release the sender.
    * Waits out any in-flight scheduled report first — reporters hold
    * single connections and are not safe to call concurrently. */
  override def close(): Unit = {
    exec.shutdownNow(): Unit
    try exec.awaitTermination(10, TimeUnit.SECONDS)
    catch { case _: InterruptedException =>
      Thread.currentThread().interrupt() }
    try reportNow() catch { case _: Exception => }
    reporter.close()
  }
}
