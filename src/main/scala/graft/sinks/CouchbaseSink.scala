package graft.sinks

import java.net.http.HttpClient
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Couchbase KV upsert sink — the engine's face of the reference's
  * couchbase module:
  *
  *  - Document conversion (AnyToCouchbaseJsonConverter.java:41): a
  *    record becomes a raw-JSON document, id = a configured key column,
  *    content = the whole record serialized; and the binary face
  *    (TupleDocument.java:29 / AvroToCouchbaseTupleConverter): id +
  *    (bytes, flags) payload.
  *  - Per-document TTL (CouchbaseWriter.java:283 setDocumentTTL):
  *    ttl == 0 → no expiry (0); with a TTL-origin field → expiry =
  *    origin (converted to seconds) + span — Couchbase's ABSOLUTE
  *    epoch-seconds expiry; without → now + span. An expiry past
  *    Int.MaxValue (Couchbase's 2038 limit) fails loudly, like the
  *    reference's toIntExact.
  *  - Async upserts with bounded in-flight and a failure-ratio gate
  *    (CouchbaseWriter.java:169's observable/future machinery →
  *    [[RecordSinks.runAsyncBatched]]).
  *
  * Transport: the real service speaks the SDK's memcached binary
  * protocol, unreachable from a zero-egress sandbox; the documents go
  * over an HTTP bulk-upsert endpoint instead (`POST
  * {base}/pools/default/buckets/{bucket}/docs`, body = JSON array of
  * `{"id","content","expiry"[,"flags","contentB64"]}`), which the
  * in-process e2e server implements — the conversion, TTL, batching
  * and failure semantics above are the reference-shaped part; swapping
  * the transport for the SDK changes none of them. */
object CouchbaseSink {

  final case class CouchbaseConfig(baseUrl: String, bucket: String,
                                   ttl: Long = 0L,
                                   ttlUnits: TimeUnit = TimeUnit.SECONDS,
                                   ttlOriginCol: Option[String] = None,
                                   ttlOriginUnits: TimeUnit = TimeUnit.MILLISECONDS,
                                   maxAttempts: Int = 3,
                                   timeoutMs: Long = 10000) {
    def docsUrl: String = s"$baseUrl/pools/default/buckets/$bucket/docs"
  }

  /** Absolute expiry column (epoch seconds, int): the reference's
    * setDocumentTTL decision tree. Overflow past Couchbase's 2038
    * Int.MaxValue limit raises in-plan. */
  private def expiryCol(cfg: CouchbaseConfig): Column = {
    if (cfg.ttl == 0L) return lit(0)
    val span = lit(cfg.ttlUnits.toSeconds(cfg.ttl))
    val origin = cfg.ttlOriginCol match {
      case Some(c) =>
        val factor = cfg.ttlOriginUnits match {
          case TimeUnit.SECONDS => lit(1L)
          case TimeUnit.MILLISECONDS => lit(1000L)
          case TimeUnit.MICROSECONDS => lit(1000000L)
          case TimeUnit.NANOSECONDS => lit(1000000000L)
          case other => throw new IllegalArgumentException(
            s"unsupported TTL origin unit: $other")
        }
        expr(s"`$c`").cast("long") / factor
      case None => unix_timestamp()
    }
    val total = (origin.cast("long") + span)
    when(total > Int.MaxValue, raise_error(lit(
      "couchbase expiry overflows 2038 (int epoch-seconds): check the " +
        "TTL origin field's units")))
      .otherwise(total.cast("int"))
  }

  /** Raw-JSON documents: (id, content, expiry) — id from `keyCol`
    * (NULL ids fail loudly: a silent auto-id breaks idempotent
    * upserts, the esBulk lesson), content = the whole record. */
  def jsonDocs(df: DataFrame, keyCol: String,
               cfg: CouchbaseConfig): DataFrame =
    df.select(
      when(col(keyCol).isNull,
        raise_error(lit(s"couchbase: null id in column '$keyCol'")))
        .otherwise(col(keyCol).cast("string")).as("id"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("content"),
      expiryCol(cfg).as("expiry"))

  /** Binary tuple documents: (id, contentB64, flags, expiry) — the
    * TupleDocument face; bytes ride base64 over the JSON transport. */
  def tupleDocs(df: DataFrame, keyCol: String, bytesCol: String,
                flagsCol: String, cfg: CouchbaseConfig): DataFrame =
    df.select(
      when(col(keyCol).isNull,
        raise_error(lit(s"couchbase: null id in column '$keyCol'")))
        .otherwise(col(keyCol).cast("string")).as("id"),
      base64(col(bytesCol)).as("contentB64"),
      col(flagsCol).cast("int").as("flags"),
      expiryCol(cfg).as("expiry"))

  /** Upsert a doc frame produced by [[jsonDocs]]/[[tupleDocs]]:
    * per-partition async batches, at-least-once (an upsert replayed is
    * the same upsert — KV idempotency by id). */
  def upsert(docs: DataFrame, cfg: CouchbaseConfig,
             async: RecordSinks.AsyncConfig =
               RecordSinks.AsyncConfig()): Unit = {
    val line = to_json(struct(docs.columns.map(col).toIndexedSeq: _*))
    val lines = docs.select(line.as("line"))
    val httpCfg = HttpSink.HttpConfig(cfg.docsUrl,
      maxAttempts = cfg.maxAttempts, timeoutMs = cfg.timeoutMs)
    RecordSinks.runAsyncBatched(lines,
      () => new RecordSinks.BatchSink[org.apache.spark.sql.Row] {
        @transient private lazy val client = HttpClient.newHttpClient()
        def writeBatch(batch: Seq[org.apache.spark.sql.Row]): Unit = {
          HttpSink.post(client, httpCfg,
            batch.map(_.getString(0)).mkString("[", ",", "]"))
          ()
        }
      }, async)
  }
}
