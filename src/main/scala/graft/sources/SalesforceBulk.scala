package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sinks.HttpSink

/** Salesforce Bulk-API-shaped extraction: create an async query job, poll
  * its batches to completion, fetch every CSV result chunk, stitch the
  * chunks into a staging directory, and parse them as ONE distributed CSV
  * read.
  *
  * Reference: SalesforceExtractor
  * (gobblin-salesforce/.../SalesforceExtractor.java:97) drives the same
  * lifecycle — `createBulkJob` → add query batch → poll `getBatchInfoList`
  * → stream each result id of each completed batch (`fetchResultBatch`) —
  * and SalesforceSource enables server-side PK chunking
  * (`Sforce-Enable-PKChunking`) so one logical query fans out into many
  * independently-extractable batches. The protocol shapes used here are
  * the public Bulk API v1 JSON/CSV dialect.
  *
  * Scale notes: job control and result download are driver-side by
  * design (the poll loop is a control-flow dependency, and result bytes
  * stream straight to the staging filesystem, never accumulating in
  * memory — O(one chunk buffer)); the DISTRIBUTED work is the CSV parse
  * over the staged chunks, one Spark input split per result chunk.
  * Server-side PK chunking is the scale path: a 100 M-row object arrives
  * as hundreds of ~250 k-row chunks, and chunk fetches are independent
  * (sequential here; the seam is `fetchResults` — a pool would fetch
  * them concurrently, exactly as the reference's `bulkApiLogin`-per-task
  * model does by running one extractor per work unit).
  *
  * Zero-egress sandbox: the HTTP layer is the shared
  * [[graft.sinks.HttpSink]] client (bounded retry on 5xx/429/connect
  * errors); tests and the oracle row drive it against an in-process JDK
  * HttpServer speaking the same dialect — real sockets, no network.
  */
object SalesforceBulk {

  /** `baseUrl` is the async-API root, e.g.
    * `http://host:port/services/async/52.0`; `sessionToken` rides the
    * `X-SFDC-Session` header on every call (the Bulk API's auth shape). */
  final case class BulkConfig(baseUrl: String,
                              sessionToken: String = "",
                              pollIntervalMs: Long = 50,
                              maxPollMs: Long = 60000,
                              http: HttpSink.HttpConfig =
                                HttpSink.HttpConfig(url = ""))

  /** Terminal batch states; anything else is still in flight. The
    * original query batch of a PK-chunked job parks at NotProcessed and
    * carries no results — the server-created chunk batches carry them. */
  private val terminal = Set("Completed", "NotProcessed")

  private def cfgFor(c: BulkConfig, url: String) = c.http.copy(url = url,
    headers = c.http.headers ++
      (if (c.sessionToken.nonEmpty) Map("X-SFDC-Session" -> c.sessionToken)
       else Map.empty))

  /** Job-control POSTs are NOT idempotent (a create/submit whose response
    * was lost may still have landed server-side; a blind retry would
    * create a second job or batch and silently double every extracted
    * row), so they get exactly ONE attempt — a lost response surfaces as
    * an error and the caller reruns with a FRESH job, leaving the orphan
    * to the server's job expiry. Result GETs retry freely. */
  private def post(client: java.net.http.HttpClient, c: BulkConfig,
                   url: String, body: String): String =
    HttpSink.send(client,
      cfgFor(c, url).copy(maxAttempts = 1), "POST", Some(body))

  private def get(client: java.net.http.HttpClient, c: BulkConfig,
                  url: String): String =
    HttpSink.send(client, cfgFor(c, url), "GET", None)

  private def jstr(v: JValue): String = v match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(
      s"expected JSON string, got $other")
  }

  /** Run `soql` as a Bulk API query job and return the stitched result.
    *
    * `pkChunkSize` enables server-side PK chunking
    * (`Sforce-Enable-PKChunking: chunkSize=N`) — the fan-out path for
    * large objects. `schema` types the parsed CSV (recommended: the Bulk
    * API serializes everything as text, so untyped reads come back
    * all-string; and a ZERO-result extract without a schema has no
    * header to name columns from, so it returns a column-less empty
    * frame). `stagingDir` must be a DEDICATED directory — it is wiped
    * before staging (the RestSource contract) — and must outlive the
    * returned lazy DataFrame.
    */
  def read(spark: SparkSession, config: BulkConfig, objectName: String,
           soql: String, pkChunkSize: Option[Int] = None,
           schema: Option[StructType] = None,
           stagingDir: Option[String] = None): DataFrame = {
    val client = java.net.http.HttpClient.newHttpClient()
    val base = config.baseUrl.stripSuffix("/")

    // 1. create the async job (CSV results, query operation)
    val chunkHeader = pkChunkSize.map(n =>
      "Sforce-Enable-PKChunking" -> s"chunkSize=$n").toMap
    val jobCfg = config.copy(http = config.http.copy(
      headers = config.http.headers ++ chunkHeader))
    val jobJson = JsonMethods.parse(post(client, jobCfg, s"$base/job",
      s"""{"operation":"query","object":"$objectName","contentType":"CSV"}"""))
    val jobId = jstr(jobJson \ "id")

    try {
      // 2. submit the SOQL as the job's query batch
      post(client, config, s"$base/job/$jobId/batch", soql)

      // 3. poll the batch list until every batch parks in a terminal
      // state (PK chunking creates batches server-side AFTER submit, and
      // the list grows while splitting runs — so poll the LIST, not the
      // one batch id we created)
      val deadline = System.nanoTime() + config.maxPollMs * 1000000L
      var batches: Seq[(String, String)] = Seq.empty // (id, state)
      var done = false
      while (!done) {
        val info = JsonMethods.parse(
          get(client, config, s"$base/job/$jobId/batch"))
        batches = (info \ "batchInfo") match {
          case JArray(items) => items.map { b =>
            (b \ "state") match {
              case JString("Failed") =>
                val msg = (b \ "stateMessage") match {
                  case JString(m) => m; case _ => "(no stateMessage)" }
                throw new java.io.IOException(
                  s"bulk job $jobId batch ${jstr(b \ "id")} Failed: $msg")
              case JString(st) => (jstr(b \ "id"), st)
              case other => throw new IllegalArgumentException(
                s"batch state shape: $other")
            }
          }
          case other => throw new IllegalArgumentException(
            s"batchInfo shape: $other")
        }
        done = batches.nonEmpty && batches.forall(b => terminal(b._2))
        if (!done) {
          if (System.nanoTime() > deadline) throw new java.io.IOException(
            s"bulk job $jobId did not complete in ${config.maxPollMs} ms; " +
              s"batch states: ${batches.map(_._2).groupBy(identity)
                .view.mapValues(_.size).toMap}")
          Thread.sleep(config.pollIntervalMs)
        }
      }

      // 4. fetch every completed batch's result chunks into staging —
      // one file per chunk (each chunk carries its own CSV header;
      // Spark's reader strips a header PER FILE, so stitching is free)
      val dir = new Path(stagingDir.getOrElse(
        s"${sys.props("java.io.tmpdir")}/graft-sfdc-${java.util.UUID.randomUUID()}"))
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dir)) fs.delete(dir, true)
      fs.mkdirs(dir)
      var chunks = 0
      batches.collect { case (bid, "Completed") => bid }.foreach { bid =>
        val resultIds = JsonMethods.parse(
          get(client, config, s"$base/job/$jobId/batch/$bid/result")) match {
          case JArray(ids) => ids.map(jstr)
          case other => throw new IllegalArgumentException(
            s"result-list shape: $other")
        }
        resultIds.foreach { rid =>
          val csv = get(client, config,
            s"$base/job/$jobId/batch/$bid/result/$rid")
          val out = fs.create(
            new Path(dir, f"result-$bid-$rid-$chunks%05d.csv"), true)
          try out.write(csv.getBytes("UTF-8")) finally out.close()
          chunks += 1
        }
      }

      if (chunks == 0) { // empty extract: typed empty frame, same contract
        val reader = spark.read.option("header", "true")
        schema.fold(reader)(s => reader.schema(s))
          .csv(spark.createDataset(Seq.empty[String])(
            org.apache.spark.sql.Encoders.STRING))
      } else {
        val reader = spark.read.option("header", "true")
        schema.fold(reader)(s => reader.schema(s)).csv(dir.toString)
      }
    } finally {
      // 5. close the job (best-effort — results are already staged)
      try post(client, config, s"$base/job/$jobId", """{"state":"Closed"}""")
      catch { case _: java.io.IOException => () }
    }
  }
}
