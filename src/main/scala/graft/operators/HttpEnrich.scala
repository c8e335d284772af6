package graft.operators

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

/** HTTP join-enrichment: build one HTTP request PER RECORD from the
  * record's own fields, execute it, and join the response (status +
  * body) onto the output record.
  *
  * Reference: HttpJoinConverter (gobblin-modules/gobblin-http/.../
  * converter/HttpJoinConverter.java:57 — "input record → HttpOperation
  * → request → response → output combining DI, RQ, RP, status"), with
  * the async variant's bounded in-flight pipelining
  * (AsyncHttpJoinConverter). Response-status policy follows the
  * reference's ResponseStatus: SERVER_ERROR fails the task (retryable
  * at the task level), CLIENT_ERROR joins a null body by default so
  * lookup misses don't kill a 10^9-row enrichment — `failOnStatus`
  * customizes both.
  *
  * Spark shape: `mapPartitions` — one HttpClient per task (the
  * reference's converter-instance-per-task lifecycle), `maxInFlight`
  * async requests pipelined per partition so wall time is bounded by
  * endpoint throughput, not per-request latency. Output order within a
  * partition is input order (responses are awaited in FIFO). This IS
  * the rare legitimate mapPartitions case: per-record calls to an
  * external service cannot be expressed as a Catalyst expression, and
  * a driver-side loop would serialize the whole corpus through one
  * machine. At 100 TB the operator is endpoint-bound by design —
  * partition count times maxInFlight is the concurrency the remote
  * service must sustain; cap partitions deliberately (coalesce) rather
  * than hammering a lookup API with a thousand tasks.
  *
  * Templates: `${col}` substitutes the record's column (URL-encoded in
  * the URL template, raw in the body template); unknown columns refuse
  * at plan time. */
object HttpEnrich {

  final case class EnrichConfig(urlTemplate: String,
                                verb: String = "GET",
                                bodyTemplate: Option[String] = None,
                                headers: Map[String, String] = Map.empty,
                                statusCol: String = "http_status",
                                responseCol: String = "http_response",
                                maxInFlight: Int = 8,
                                timeoutMs: Long = 10000,
                                failOnStatus: Int => Boolean = _ >= 500)

  private val Placeholder = "\\$\\{([A-Za-z0-9_]+)\\}".r

  private[operators] def render(template: String, row: Row,
                                idx: Map[String, Int],
                                urlEncode: Boolean): String =
    Placeholder.replaceAllIn(template, m => {
      val v = String.valueOf(row.get(idx(m.group(1))))
      java.util.regex.Matcher.quoteReplacement(
        if (urlEncode) URLEncoder.encode(v, "UTF-8") else v)
    })

  /** Any referenced column NULL? Such a record has no lookup key — it
    * null-joins instead of querying the endpoint with the literal
    * string "null" (a plausible-looking wrong enrichment). */
  private def anyRefNull(row: Row, refIdx: Seq[Int]): Boolean =
    refIdx.exists(row.isNullAt)

  /** Columns a template references — validated against the input
    * schema at PLAN time, not per row on an executor. */
  private[operators] def refs(template: String): Seq[String] =
    Placeholder.findAllMatchIn(template).map(_.group(1)).toSeq.distinct

  // one client per executor JVM: the JDK client owns a selector thread
  // and a connection pool, so a client per TASK leaks both until GC
  private lazy val sharedClient = HttpClient.newHttpClient()

  def enrich(df: DataFrame, cfg: EnrichConfig): DataFrame = {
    val cols = df.columns.toSet
    val templates = cfg.urlTemplate +: cfg.bodyTemplate.toSeq
    val wanted = templates.flatMap(refs).distinct
    val missing = wanted.filterNot(cols.contains)
    require(missing.isEmpty,
      s"template references unknown column(s): ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    // a ${...} the placeholder grammar does NOT match would survive
    // render() literally and explode per-record on executors — refuse
    // it here, where the contract says refusals happen
    templates.foreach { t =>
      require(!Placeholder.replaceAllIn(t, "").contains("${"),
        s"malformed placeholder in template '$t' — names are [A-Za-z0-9_]+")
    }
    Seq(cfg.statusCol, cfg.responseCol).foreach(c => require(!cols.contains(c),
      s"output column '$c' already exists in the input — rename it " +
        "(statusCol/responseCol) or drop the old one before re-enriching"))
    require(cfg.maxInFlight >= 1, s"maxInFlight must be >= 1: ${cfg.maxInFlight}")
    val outSchema = StructType(df.schema.fields)
      .add(cfg.statusCol, IntegerType)
      .add(cfg.responseCol, StringType, nullable = true)
    val idx = df.columns.zipWithIndex.toMap
    val refIdx = wanted.map(idx)
    val c = cfg // stable reference for the closure
    df.mapPartitions { it: Iterator[Row] =>
      val client = sharedClient
      // FIFO pipeline of bounded depth: issue up to maxInFlight async
      // requests ahead of the await point; a null-keyed row rides the
      // window with no request (None) so output order is preserved
      val window = new java.util.ArrayDeque[(Row,
        Option[java.util.concurrent.CompletableFuture[HttpResponse[String]]])]()
      def issue(row: Row): Unit =
        if (anyRefNull(row, refIdx)) window.addLast((row, None))
        else {
          val url = render(c.urlTemplate, row, idx, urlEncode = true)
          val b = HttpRequest.newBuilder(URI.create(url))
            .timeout(Duration.ofMillis(c.timeoutMs))
          c.headers.foreach { case (k, v) => b.header(k, v) }
          val req = b.method(c.verb, c.bodyTemplate.fold(
            HttpRequest.BodyPublishers.noBody())(t =>
            HttpRequest.BodyPublishers.ofString(
              render(t, row, idx, urlEncode = false)))).build()
          window.addLast((row,
            Some(client.sendAsync(req, HttpResponse.BodyHandlers.ofString()))))
        }
      def await(): Row = window.removeFirst() match {
        case (row, None) => // no lookup key: null status, null body
          Row.fromSeq(row.toSeq :+ null :+ null)
        case (row, Some(fut)) =>
          val resp = fut.join()
          if (c.failOnStatus(resp.statusCode()))
            throw new java.io.IOException(
              s"enrichment ${c.verb} answered HTTP ${resp.statusCode()}: " +
                resp.body().take(200))
          val body =
            if (resp.statusCode() / 100 == 2) resp.body() else null
          Row.fromSeq(row.toSeq :+ Integer.valueOf(resp.statusCode()) :+ body)
      }
      new Iterator[Row] {
        override def hasNext: Boolean = it.hasNext || !window.isEmpty
        override def next(): Row = {
          while (it.hasNext && window.size() < c.maxInFlight) issue(it.next())
          await()
        }
      }
    }(Encoders.row(outSchema))
  }
}
