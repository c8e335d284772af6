package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concrete HTTP record sinks (the reference's network-service writer
  * family): batched JSON POSTs with bounded retry, and the
  * Elasticsearch `_bulk` dialect with per-item error checking.
  *
  *  - AsyncHttpWriter semantics (gobblin-modules/gobblin-http/.../
  *    AsyncHttpWriter.java:49): bounded attempts, retry on connect
  *    errors and retryable statuses (5xx/429), fail fast on other 4xx;
  *  - ElasticsearchDataWriter semantics (gobblin-modules/
  *    gobblin-elasticsearch/.../writer/ElasticsearchDataWriterBuilder
  *    .java + bulk serializers): `_bulk` NDJSON with an index action per
  *    record and a malformed-doc budget — an HTTP 200 whose body says
  *    `"errors":true` is still a failure for the items concerned.
  *
  * Rows serialize through `df.toJSON` (Tungsten codegen, no per-field
  * reflection), then batches ride [[RecordSinks.runAsyncBatched]], so
  * the bounded-in-flight pool and the failure-ratio commit gate are the
  * same decorators every other service sink uses. One HttpClient per
  * partition; delivery is at-least-once (Spark task retry replays a
  * partition), which both target systems tolerate (ES writes are
  * idempotent by document id — pass `idCol`).
  */
object HttpSink {

  final case class HttpConfig(url: String,
                              headers: Map[String, String] = Map.empty,
                              maxAttempts: Int = 3,
                              initialBackoffMs: Long = 50,
                              timeoutMs: Long = 10000)

  /** Statuses worth a retry: transient server trouble or throttling. */
  private def retryable(status: Int): Boolean =
    status >= 500 || status == 429

  /** One request with bounded retry/backoff; returns the final successful
    * body, throws after maxAttempts or on a non-retryable status. Shared
    * by the sinks (POST) and the REST source's fetcher (GET). */
  private[graft] def send(client: HttpClient, cfg: HttpConfig,
                          method: String, body: Option[String]): String = {
    val builder = HttpRequest.newBuilder(URI.create(cfg.url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
    // default content type only when the caller sets none — header()
    // APPENDS, so an unconditional default would ride along with a
    // caller's vendor content type as a second value
    if (!cfg.headers.keysIterator.exists(_.equalsIgnoreCase("Content-Type")))
      builder.header("Content-Type", "application/json")
    cfg.headers.foreach { case (k, v) => builder.header(k, v) }
    val req = builder.method(method, body.fold(
      HttpRequest.BodyPublishers.noBody())(
      HttpRequest.BodyPublishers.ofString(_))).build()
    var attempt = 0
    var backoff = cfg.initialBackoffMs
    while (true) {
      attempt += 1
      val outcome =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() / 100 == 2) Right(resp.body())
          else Left((retryable(resp.statusCode()),
            s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}"))
        } catch { // connect/timeout: always retryable
          case e: java.io.IOException => Left((true, e.toString))
        }
      outcome match {
        case Right(respBody) => return respBody
        case Left((canRetry, msg)) =>
          if (!canRetry || attempt >= cfg.maxAttempts)
            throw new java.io.IOException(
              s"$method ${cfg.url} failed after $attempt attempt(s): $msg")
          Thread.sleep(backoff)
          backoff = (backoff * 2).max(1L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** [[send]]'s binary-response twin (same timeout/retry/backoff/header
    * discipline, byte-array body handler) — for downloads whose payload
    * a String decode would corrupt. */
  private[graft] def sendBytes(client: HttpClient, cfg: HttpConfig,
                               method: String = "GET"): Array[Byte] = {
    val builder = HttpRequest.newBuilder(URI.create(cfg.url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
    cfg.headers.foreach { case (k, v) => builder.header(k, v) }
    val req = builder.method(method,
      HttpRequest.BodyPublishers.noBody()).build()
    var attempt = 0
    var backoff = cfg.initialBackoffMs
    while (true) {
      attempt += 1
      val outcome =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
          if (resp.statusCode() / 100 == 2) Right(resp.body())
          else Left((retryable(resp.statusCode()),
            s"HTTP ${resp.statusCode()}"))
        } catch {
          case e: java.io.IOException => Left((true, e.toString))
        }
      outcome match {
        case Right(bytes) => return bytes
        case Left((canRetry, msg)) =>
          if (!canRetry || attempt >= cfg.maxAttempts)
            throw new java.io.IOException(
              s"$method ${cfg.url} failed after $attempt attempt(s): $msg")
          Thread.sleep(backoff)
          backoff = (backoff * 2).max(1L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[sinks] def post(client: HttpClient, cfg: HttpConfig,
                          body: String): String =
    send(client, cfg, "POST", Some(body))

  private[graft] def get(client: HttpClient, cfg: HttpConfig): String =
    send(client, cfg, "GET", None)

  /** POST the frame as JSON-array batches. Each batch is one request;
    * batch acceptance follows the async failure-ratio gate. */
  def postJsonBatches(df: DataFrame, cfg: HttpConfig,
                      async: RecordSinks.AsyncConfig =
                        RecordSinks.AsyncConfig()): Unit = {
    val jsonDf = df.toJSON.toDF("json")
    RecordSinks.runAsyncBatched(jsonDf, () => new RecordSinks.BatchSink[org.apache.spark.sql.Row] {
      @transient private lazy val client = HttpClient.newHttpClient()
      def writeBatch(batch: Seq[org.apache.spark.sql.Row]): Unit = {
        post(client, cfg, batch.map(_.getString(0)).mkString("[", ",", "]"))
        ()
      }
    }, async)
  }

  final case class EsConfig(baseUrl: String, // e.g. http://host:9200
                            index: String,
                            idCol: Option[String] = None,
                            http: Option[HttpConfig] = None) {
    def httpConfig: HttpConfig =
      http.getOrElse(HttpConfig(url = ""))
        .copy(url = s"${baseUrl.stripSuffix("/")}/_bulk")
  }

  /** Index the frame into Elasticsearch via `_bulk`: every record is an
    * `{"index": …}` action line plus its document line. A 2xx response
    * with `"errors":true` fails the batch with the offending item
    * statuses — exactly the malformed-doc accounting the reference's
    * bulk writer does. */
  def esBulk(df: DataFrame, cfg: EsConfig,
             async: RecordSinks.AsyncConfig = RecordSinks.AsyncConfig()): Unit = {
    // to_json produces the whole action object, so _index and _id are
    // JSON-escaped properly (an id containing quotes/backslashes must not
    // corrupt the NDJSON and 400-fail the entire bulk request). A NULL id
    // fails LOUDLY: to_json would silently drop the _id field and ES
    // would auto-generate one, breaking the idempotency-by-id that makes
    // at-least-once delivery safe.
    val action = cfg.idCol match {
      case Some(id) => to_json(struct(
        struct(lit(cfg.index).as("_index"),
          when(col(id).isNull, raise_error(lit(
            s"esBulk: null id in column '$id' — ids must be present for " +
              "idempotent indexing")))
            .otherwise(col(id).cast("string")).as("_id")).as("index")))
      case None => to_json(struct(
        struct(lit(cfg.index).as("_index")).as("index")))
    }
    val lines = df
      .withColumn("__action", action)
      .withColumn("__doc", to_json(struct(df.columns.map(col): _*)))
      .select(concat(col("__action"), lit("\n"), col("__doc")).as("line"))
    val httpCfg = cfg.httpConfig
    RecordSinks.runAsyncBatched(lines, () => new RecordSinks.BatchSink[org.apache.spark.sql.Row] {
      @transient private lazy val client = HttpClient.newHttpClient()
      def writeBatch(batch: Seq[org.apache.spark.sql.Row]): Unit = {
        val body = batch.map(_.getString(0)).mkString("", "\n", "\n")
        val resp = post(client, httpCfg, body)
        // parse, don't substring-match: proxies/gateways reformat JSON
        import org.json4s._
        val parsed = org.json4s.jackson.JsonMethods.parse(resp)
        if ((parsed \ "errors") == JBool(true)) {
          val bad = (parsed \ "items" \\ "status") match {
            case JObject(fields) => fields.map(_._2)
            case v => List(v)
          }
          val failedCodes = bad.collect {
            case JInt(s) if s >= 300 => s.toInt }
          throw new java.io.IOException(
            s"_bulk accepted with ${failedCodes.size} item failure(s): " +
              failedCodes.groupBy(identity).view.mapValues(_.size)
                .toMap.toString)
        }
      }
    }, async)
  }
}
