package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sinks.HttpSink

/** Zuora AQuA (aggregate-query API) export: POST a batch of ZOQL
  * queries as one job, poll the job until `completed`, then download
  * each result batch's CSV file and parse it distributed.
  *
  * Reference: gobblin-zuora (ZuoraClientImpl.java:72 — POST
  * `batch-query/` with a {partner, project, queries:[{name, query,
  * deleted}], format, version} payload, job id from the response;
  * :163 executeGetRequestInternal — poll `batch-query/jobs/<id>`,
  * anything but `completed` keeps polling, file ids from
  * `batches[].fileId`; ZuoraClientFilesStreamer.java:147 — results
  * stream from `file/<fileId>`; ZuoraUtil.java:72 — HTTP Basic auth on
  * every call). Two reference behaviors worth keeping exactly:
  *  - the job POST IS retried (unlike Salesforce's create-job): AQuA
  *    sessions are keyed server-side by (partner, project), so a
  *    re-POST continues the same session instead of double-exporting —
  *    that is also what makes AQuA's stateful incremental mode work;
  *  - a `deleted` column in the query payload asks the server to
  *    include soft-deleted rows flagged in that column — the
  *    compliance-sync shape ([[graft.operators.Purge]] consumes it).
  *
  * Scale shape: job control is driver-side control flow (as the
  * reference); the per-file CSV downloads are DISTRIBUTED, one task
  * per result file streaming to the staging filesystem, and the parse
  * is a normal distributed read. A multi-query job comes back as one
  * DataFrame per query name — AQuA's batches answer in query order
  * with their names. */
object ZuoraAqua {

  final case class ZuoraConfig(baseUrl: String, user: String,
                               password: String,
                               partner: String = "sample",
                               project: String = "sample",
                               pollIntervalMs: Long = 50,
                               maxPollMs: Long = 60000,
                               http: HttpSink.HttpConfig =
                                 HttpSink.HttpConfig(url = ""))

  /** One ZOQL query of the job; `deletedColumn` asks for soft-deleted
    * rows flagged in that column (ZuoraDeletedColumn.java:25). */
  final case class ZuoraQuerySpec(name: String, zoql: String,
                                  deletedColumn: Option[String] = None)

  private def js(s: String) = graft.JsonUtil.jstr(s)

  private def authHeader(c: ZuoraConfig): (String, String) =
    "Authorization" -> ("Basic " + Base64.getEncoder.encodeToString(
      s"${c.user}:${c.password}".getBytes(UTF_8)))

  private def cfgFor(c: ZuoraConfig, url: String) =
    c.http.copy(url = url, headers = c.http.headers + authHeader(c))

  /** SqlQueryUtils.addPredicate: append a watermark condition to the
    * ZOQL (WHERE if none, AND otherwise) — the QueryBasedSource
    * incremental face. */
  def withPredicate(zoql: String, condition: String): String =
    // word-boundary match so newline-formatted ZOQL ("...\nWHERE x")
    // still takes the AND branch (a substring " where " test misses it)
    if ("(?is).*\\bwhere\\b.*".r.matches(zoql)) s"$zoql AND $condition"
    else s"$zoql WHERE $condition"

  private def strField(v: JValue, f: String): String = v \ f match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(
      s"Zuora response missing '$f': $other")
  }

  /** Run the job end-to-end; one DataFrame per query name. */
  def export(spark: SparkSession, cfg: ZuoraConfig,
             queries: Seq[ZuoraQuerySpec], stagingDir: String,
             options: Map[String, String] = Map("header" -> "true"),
             fetchParallelism: Int = 4): Map[String, DataFrame] = {
    require(queries.nonEmpty, "at least one query")
    val client = java.net.http.HttpClient.newHttpClient()
    val qJson = queries.map { q =>
      s"""{"name":${js(q.name)},"query":${js(q.zoql)}""" +
        q.deletedColumn.fold("")(c =>
          s""","deleted":{"column":${js(c)}}""") + "}"
    }.mkString("[", ",", "]")
    val payload =
      s"""{"partner":${js(cfg.partner)},"project":${js(cfg.project)},""" +
        s""""queries":$qJson,"format":"csv","version":"1.1"}"""
    // POST retried (cfg.http.maxAttempts): the AQuA session key
    // (partner, project) makes a re-POST continue, not duplicate
    val created = JsonMethods.parse(HttpSink.send(client,
      cfgFor(cfg, s"${cfg.baseUrl}batch-query/"), "POST", Some(payload)))
    val jobId = strField(created, "id")
    val deadline = System.currentTimeMillis() + cfg.maxPollMs
    var resp = created
    var status = ""
    var first = true
    while (status != "completed") {
      if (!first) {
        require(System.currentTimeMillis() < deadline,
          s"Zuora job $jobId still '$status' after ${cfg.maxPollMs} ms")
        Thread.sleep(cfg.pollIntervalMs)
      }
      first = false
      resp = JsonMethods.parse(HttpSink.send(client,
        cfgFor(cfg, s"${cfg.baseUrl}batch-query/jobs/$jobId"), "GET", None))
      status = strField(resp, "status")
      require(status != "error" && status != "aborted",
        s"Zuora job $jobId failed server-side (status $status) — " +
          "non-transient, not retried")
    }
    val batches = resp \ "batches" match {
      case JArray(items) => items.map(b =>
        (strField(b, "name"), strField(b, "fileId")))
      case other => throw new IllegalArgumentException(
        s"completed job $jobId carries no batches: $other")
    }
    // distributed file fetch, one task per result file
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileIds = batches.map(_._2)
    val stagingRoot = stagingDir
    spark.sparkContext
      .parallelize(fileIds, math.min(fetchParallelism, fileIds.length))
      .foreachPartition { it: Iterator[String] =>
        val c = java.net.http.HttpClient.newHttpClient()
        val fs = new Path(stagingRoot).getFileSystem(hadoopConf.value)
        it.foreach { fid =>
          val body = HttpSink.send(c,
            cfgFor(cfg, s"${cfg.baseUrl}file/$fid"), "GET", None)
          val os = fs.create(new Path(s"$stagingRoot/$fid.csv"), true)
          try os.write(body.getBytes(UTF_8)) finally os.close()
        }
      }
    val reader = spark.read.options(options)
    batches.groupBy(_._1).map { case (name, bs) =>
      name -> reader.csv(bs.map(b => s"$stagingRoot/${b._2}.csv"): _*)
    }
  }
}

/** In-process AQuA endpoint — the zero-egress stand-in (q101 pattern):
  * Basic-auth-checked job POST (a `fail-me` project answers `error`),
  * poll countdown through `executing`, per-query batches with CSV
  * files served from `file/<id>`. Re-POSTing the same (partner,
  * project) returns the SAME job — the AQuA session contract. */
final class ZuoraSim(user: String, password: String,
                     queryCsv: String => String, pollsUntilDone: Int = 2) {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private val jobs = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[String], Int)]() // jobId -> (query names, polls left)
  private val sessions = new java.util.concurrent.ConcurrentHashMap[
    String, String]() // partner|project -> jobId
  private val seq = new java.util.concurrent.atomic.AtomicInteger()
  @volatile var posts: Int = 0

  private val srv = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  def baseUrl: String = s"http://127.0.0.1:${srv.getAddress.getPort}/"
  def stop(): Unit = srv.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization")).contains(
      "Basic " + Base64.getEncoder.encodeToString(
        s"$user:$password".getBytes(UTF_8)))

  srv.createContext("/", (ex: HttpExchange) => {
    if (!authed(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
    else {
      val segs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
      (ex.getRequestMethod, segs) match {
        case ("POST", List("batch-query")) =>
          posts += 1
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val json = JsonMethods.parse(body)
          val key = (json \ "partner").values.toString + "|" +
            (json \ "project").values.toString
          if (key.contains("fail-me"))
            respond(ex, 200, s"""{"id":"zj-err","status":"error"}""")
          else {
            val id = sessions.computeIfAbsent(key, _ => {
              val names = json \ "queries" match {
                case JArray(items) => items.map(q =>
                  (q \ "name").values.toString)
                case _ => Nil
              }
              val jid = s"zj${seq.incrementAndGet()}"
              jobs.put(jid, (names, pollsUntilDone))
              jid
            })
            respond(ex, 200, s"""{"id":"$id","status":"pending"}""")
          }
        case ("GET", List("batch-query", "jobs", id)) =>
          Option(jobs.get(id)) match {
            case Some((names, left)) if left > 1 =>
              jobs.put(id, (names, left - 1))
              respond(ex, 200, s"""{"id":"$id","status":"executing"}""")
            case Some((names, _)) =>
              val bs = names.map(n =>
                s"""{"name":${graft.JsonUtil.jstr(n)},"fileId":"zf-$n"}""")
                .mkString(",")
              respond(ex, 200,
                s"""{"id":"$id","status":"completed","batches":[$bs]}""")
            case None =>
              if (id == "zj-err")
                respond(ex, 200, s"""{"id":"$id","status":"error"}""")
              else respond(ex, 404, """{"error":"no such job"}""")
          }
        case ("GET", List("file", fid)) =>
          respond(ex, 200, queryCsv(fid.stripPrefix("zf-")))
        case other => respond(ex, 404, s"""{"error":"no route: $other"}""")
      }
    }
  })

  srv.start()
}
