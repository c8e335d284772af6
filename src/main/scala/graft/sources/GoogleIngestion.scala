package graft.sources

import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sinks.HttpSink

/** Google Drive + Google Analytics unsampled-report ingestion — the two
  * remaining google-ingestion source families (Webmaster landed in
  * round 10).
  *
  * Reference:
  *  - GoogleDriveSource (gobblin-modules/google-ingestion/.../google/
  *    GoogleDriveSource.java:45) is FileBasedSource over
  *    GoogleDriveFsHelper (GoogleDriveFsHelper.java:45): recursive ls
  *    by folder id with folders EXCLUDED and a missing folder answered
  *    as an EMPTY list (not an error), getFileSize/getFileMTime by file
  *    id, streamed download, deleteFile. Re-expressed here as
  *    [[DriveClient]] (the Drive v3 REST dialect: `GET /drive/v3/files
  *    ?q='<id>'+in+parents` with `nextPageToken` paging, `GET
  *    /drive/v3/files/<id>?alt=media` for content, Bearer auth) under
  *    the same snapshot-diff incremental planner every file source
  *    here shares ([[ManifestStore]]).
  *  - GoogleAnalyticsUnsampledSource/Extractor
  *    (GoogleAnalyticsUnsampledSource.java:39,
  *    GoogleAnalyticsUnsampledExtractor.java:94): GA's unsampled
  *    reports are ASYNC — insert a report request (view/date-range/
  *    metrics/dimensions), poll its status until COMPLETED (a FAILED
  *    status is non-transient: fail immediately, never retry —
  *    requestUnsampledReport wraps it in NonTransientException), then
  *    the finished CSV lands in Google DRIVE and extraction is just the
  *    Drive download path; the next watermark is endDate + 1 day as
  *    `yyyyMMddHHmmss` (WATERMARK_INPUTFORMAT), and the temp report is
  *    deleted from Drive after extraction unless told otherwise.
  *
  * Scale shape: listing/polling is driver-side control flow (as in the
  * reference's planning pass); Drive file fetches are DISTRIBUTED, one
  * HTTP client per task streaming to the staging filesystem; the CSV
  * parse is a normal distributed read over staged files. GA report
  * creation is rate-limited server-side — the poll loop is the
  * throughput bound by design, not the parse. */
object GoogleIngestion {

  /** Bearer-token Drive v3 endpoint config; serializable so executors
    * can fetch with their own clients. */
  final case class DriveConfig(baseUrl: String, accessToken: String,
                               pageSize: Int = 100,
                               http: HttpSink.HttpConfig =
                                 HttpSink.HttpConfig(url = ""))

  final case class DriveFile(id: String, name: String, mimeType: String,
                             size: Long, modifiedMs: Long) {
    def isFolder: Boolean = mimeType == DriveClient.FolderMime
  }

  object DriveClient {
    val FolderMime = "application/vnd.google-apps.folder"

    private def cfgFor(c: DriveConfig, url: String) = c.http.copy(url = url,
      headers = c.http.headers + ("Authorization" -> s"Bearer ${c.accessToken}"))

    private def get(client: java.net.http.HttpClient, c: DriveConfig,
                    url: String): String =
      HttpSink.send(client, cfgFor(c, url), "GET", None)

    private def str(v: JValue, field: String): String = v \ field match {
      case JString(s) => s
      case JNothing => ""
      case other => other.values.toString
    }

    /** One page of children of `folderId` (Drive's
      * `q='<id>' in parents` listing). */
    private def listPage(client: java.net.http.HttpClient, c: DriveConfig,
                         folderId: String, pageToken: Option[String])
        : (Seq[DriveFile], Option[String]) = {
      val q = URLEncoder.encode(s"'$folderId' in parents", "UTF-8")
      val fields = URLEncoder.encode(
        "nextPageToken,files(id,name,mimeType,size,modifiedTime)", "UTF-8")
      val url = s"${c.baseUrl}/drive/v3/files?q=$q&pageSize=${c.pageSize}" +
        s"&fields=$fields" +
        pageToken.fold("")(t => s"&pageToken=${URLEncoder.encode(t, "UTF-8")}")
      val json = JsonMethods.parse(get(client, c, url))
      val files = json \ "files" match {
        case JArray(items) => items.map { f =>
          DriveFile(str(f, "id"), str(f, "name"), str(f, "mimeType"),
            str(f, "size") match { case "" => 0L; case s => s.toLong },
            str(f, "modifiedTime") match {
              case "" => 0L
              case t => java.time.Instant.parse(t).toEpochMilli
            })
        }
        case _ => Nil
      }
      val next = json \ "nextPageToken" match {
        case JString(t) if t.nonEmpty => Some(t)
        case _ => None
      }
      (files, next)
    }

    /** Children of `folderId`, all pages. A folder the server answers
      * 404 for lists as EMPTY — GoogleDriveFsHelper.ls catches
      * FileNotFoundException and returns an empty result. */
    def list(client: java.net.http.HttpClient, c: DriveConfig,
             folderId: String): Seq[DriveFile] =
      try {
        val out = Seq.newBuilder[DriveFile]
        var token: Option[String] = None
        var first = true
        while (first || token.isDefined) {
          first = false
          val (files, next) = listPage(client, c, folderId, token)
          out ++= files
          token = next
        }
        out.result()
      } catch {
        case e: Exception if e.getMessage != null &&
            e.getMessage.contains("HTTP 404") => Nil
      }

    /** Recursive file listing under `folderId` — folders excluded, the
      * helper's ls contract. */
    def lsRecursive(client: java.net.http.HttpClient, c: DriveConfig,
                    folderId: String): Seq[DriveFile] =
      list(client, c, folderId).flatMap { f =>
        if (f.isFolder) lsRecursive(client, c, f.id) else Seq(f)
      }

    /** File content (`alt=media`) as a STRING — only for content known
      * to be UTF-8 text (the GA CSV report path). Binary-safe staging
      * goes through [[downloadBytes]]. */
    def download(client: java.net.http.HttpClient, c: DriveConfig,
                 fileId: String): String =
      get(client, c, s"${c.baseUrl}/drive/v3/files/$fileId?alt=media")

    /** File content (`alt=media`) as raw bytes — a parquet/gzip Drive
      * file round-tripped through a String decode would corrupt on the
      * first invalid-UTF-8 sequence. Same timeout/retry/backoff/header
      * discipline as every other call (a hand-built request here cost
      * staging its hang-protection — a stalled connection froze the
      * executor task with no timeout and one transient 503 killed the
      * whole job). */
    def downloadBytes(client: java.net.http.HttpClient, c: DriveConfig,
                      fileId: String): Array[Byte] =
      HttpSink.sendBytes(client,
        cfgFor(c, s"${c.baseUrl}/drive/v3/files/$fileId?alt=media"))

    def delete(client: java.net.http.HttpClient, c: DriveConfig,
               fileId: String): Unit = {
      // delete is idempotent cleanup — one attempt, a lost response
      // leaves the file to Drive's trash expiry (the Salesforce
      // job-control rule)
      HttpSink.send(client, cfgFor(c, s"${c.baseUrl}/drive/v3/files/$fileId")
        .copy(maxAttempts = 1), "DELETE", None)
      ()
    }
  }

  /** Snapshot-diff incremental planner over a Drive folder — the
    * FileBasedSource face, sharing manifest semantics with
    * [[ManifestSource]]/[[SftpFileSource]]: a file re-extracts when its
    * (id, size, modifiedTime) is not in the committed manifest. */
  object GoogleDriveSource {

    final case class Plan(newFiles: Seq[DriveFile],
                          df: DataFrame,
                          commit: () => Unit)

    def plan(spark: SparkSession, cfg: DriveConfig, folderId: String,
             stateDir: String, dataset: String, stagingDir: String,
             format: String = "csv",
             options: Map[String, String] = Map.empty,
             fetchParallelism: Int = 4): Plan = {
      val store = new ManifestStore(spark, stateDir)
      val client = java.net.http.HttpClient.newHttpClient()
      val current = DriveClient.lsRecursive(client, cfg, folderId)
      val committed = store.read(dataset)
      val fresh = current.filterNot(f =>
        ManifestSource.committedCovers(committed, f.id, f.size, f.modifiedMs))
      val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      // ids draw from [A-Za-z0-9_-]: one starting '_' (or a future '.')
      // would stage as a file Spark's listing treats as hidden metadata
      // and silently drops — the SftpSource.stagedName hazard class. A
      // constant safe prefix fixes it; ids are already unique, so no
      // disambiguating hash is needed.
      val staged = fresh.map(f => s"$stagingDir/d-${f.id}")
      if (fresh.nonEmpty) {
        val ids = fresh.map(_.id)
        val stagingRoot = stagingDir
        spark.sparkContext
          .parallelize(ids, math.min(fetchParallelism, ids.length))
          .foreachPartition { it: Iterator[String] =>
            val c = java.net.http.HttpClient.newHttpClient()
            val fs = new Path(stagingRoot).getFileSystem(hadoopConf.value)
            it.foreach { id =>
              val body = DriveClient.downloadBytes(c, cfg, id)
              val os = fs.create(new Path(s"$stagingRoot/d-$id"), true)
              try os.write(body) finally os.close()
            }
          }
      }
      val reader = spark.read.format(format).options(options)
      val df =
        if (staged.nonEmpty) reader.load(staged: _*)
        else ManifestSource.emptyDelta(spark, reader, stagingDir)
      Plan(fresh, df,
        () => store.commit(dataset,
          current.map(f => ManifestSource.FileMeta(f.id, f.size, f.modifiedMs))))
    }
  }

  // ---- Google Analytics unsampled reports ----

  /** The async report request (UnsampledReport fields the reference
    * sends: title, view, date range, metrics + optional dimensions/
    * segment/filters). Dates are `yyyy-MM-dd`. */
  final case class GaRequest(accountId: String, webPropertyId: String,
                             viewId: String, title: String,
                             startDate: String, endDate: String,
                             metrics: String, dimensions: String = "",
                             segment: String = "", filters: String = "")

  final case class GaConfig(baseUrl: String, accessToken: String,
                            pollIntervalMs: Long = 50,
                            maxPollMs: Long = 60000,
                            http: HttpSink.HttpConfig =
                              HttpSink.HttpConfig(url = ""))

  final case class GaResult(df: DataFrame, reportId: String,
                            driveFileId: String, nextWatermark: Long)

  object GoogleAnalyticsUnsampled {

    private def cfgFor(c: GaConfig, url: String) = c.http.copy(url = url,
      headers = c.http.headers + ("Authorization" -> s"Bearer ${c.accessToken}"))

    private def js(s: String) = graft.JsonUtil.jstr(s)

    private def strField(v: JValue, f: String): String = v \ f match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(
        s"GA response missing '$f': $other")
    }

    /** endDate + 1 day in the reference's WATERMARK_INPUTFORMAT
      * (`yyyyMMddHHmmss`) — the value a QueryBasedSource-style
      * incremental scheduler hands to the next run. */
    private[sources] def nextWatermarkOf(endDate: String): Long = {
      val next = java.time.LocalDate.parse(endDate).plusDays(1)
      next.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd")).toLong * 1000000L // HHmmss = 000000
    }

    /** Insert the report request, poll to COMPLETED, download the CSV
      * from Drive, stage it, and return the distributed parse. FAILED
      * is refused immediately (non-transient — the server said no);
      * only PENDING polls. The temp Drive file is deleted after staging
      * when `deleteTempReport` (the extractor's default). */
    def extract(spark: SparkSession, ga: GaConfig, drive: DriveConfig,
                req: GaRequest, stagingDir: String,
                options: Map[String, String] = Map("header" -> "true"),
                deleteTempReport: Boolean = true): GaResult = {
      val client = java.net.http.HttpClient.newHttpClient()
      val insertUrl = s"${ga.baseUrl}/analytics/v3/management/accounts/" +
        s"${req.accountId}/webproperties/${req.webPropertyId}/profiles/" +
        s"${req.viewId}/unsampledReports"
      // insert is NOT idempotent: one attempt (the Salesforce rule —
      // a blind retry could create a second report server-side)
      val body =
        s"""{"title":${js(req.title)},"start-date":${js(req.startDate)},""" +
          s""""end-date":${js(req.endDate)},"metrics":${js(req.metrics)},""" +
          s""""dimensions":${js(req.dimensions)},"segment":${js(req.segment)},""" +
          s""""filters":${js(req.filters)}}"""
      val created = JsonMethods.parse(HttpSink.send(client,
        cfgFor(ga, insertUrl).copy(maxAttempts = 1), "POST", Some(body)))
      val reportId = strField(created, "id")
      val statusUrl = s"$insertUrl/$reportId"
      val deadline = System.currentTimeMillis() + ga.maxPollMs
      var status = strField(created, "status")
      var last = created
      while (status == "PENDING") {
        require(System.currentTimeMillis() < deadline,
          s"GA report $reportId still PENDING after ${ga.maxPollMs} ms")
        Thread.sleep(ga.pollIntervalMs)
        last = JsonMethods.parse(HttpSink.send(client,
          cfgFor(ga, statusUrl), "GET", None))
        status = strField(last, "status")
      }
      require(status == "COMPLETED",
        s"GA unsampled report $reportId failed server-side (status " +
          s"$status) — non-transient, not retried")
      require(strField(last, "downloadType") == "GOOGLE_DRIVE",
        "only GOOGLE_DRIVE downloadType is supported (as the reference)")
      val fileId = strField(last \ "driveDownloadDetails", "documentId")
      val csv = DriveClient.download(client, drive, fileId)
      // same hidden-prefix hazard as the Drive staging above: the
      // reportId is server-assigned, so give it a constant safe prefix
      val staged = new Path(s"$stagingDir/ga-$reportId.csv")
      val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(staged, true)
      try os.write(csv.getBytes(UTF_8)) finally os.close()
      if (deleteTempReport) DriveClient.delete(client, drive, fileId)
      val df = spark.read.options(options).csv(staged.toString)
      GaResult(df, reportId, fileId, nextWatermarkOf(req.endDate))
    }
  }
}

/** In-process Drive v3 + GA management endpoint — the zero-egress
  * test/oracle stand-in (real sockets, the q101/q163/q164 pattern).
  * Serves an in-memory folder tree with Drive's paged `'id' in parents`
  * listing and `alt=media` download, and the GA unsampled-report
  * lifecycle: insert answers PENDING (or FAILED when the title asks for
  * it), each status poll counts down, and completion materializes the
  * report CSV as a Drive file. Every route requires the Bearer token —
  * a wrong one answers 401. */
final class GoogleApiSim(token: String, reportCsv: String => String,
                         pollsUntilDone: Int = 2) {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  final case class SimFile(id: String, name: String, mime: String,
                           content: Array[Byte], modifiedMs: Long,
                           parent: String)

  private val files = new java.util.concurrent.ConcurrentHashMap[String, SimFile]()
  private val pending = new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()
  private val reportSeq = new java.util.concurrent.atomic.AtomicInteger()
  @volatile var statusPolls: Int = 0

  def addFolder(id: String, name: String, parent: String = "root"): Unit =
    files.put(id, SimFile(id, name, GoogleIngestion.DriveClient.FolderMime,
      Array.empty, 0L, parent))
  def addFile(id: String, name: String, content: String, parent: String,
              modifiedMs: Long): Unit =
    addBinaryFile(id, name, content.getBytes(UTF_8), parent, modifiedMs,
      "text/csv")
  /** Raw bytes — a real Drive serves parquet/gzip faithfully, so the
    * sim must too (this is what proves the binary staging path). */
  def addBinaryFile(id: String, name: String, content: Array[Byte],
                    parent: String, modifiedMs: Long,
                    mime: String = "application/octet-stream"): Unit =
    files.put(id, SimFile(id, name, mime, content, modifiedMs, parent))
  def hasFile(id: String): Boolean = files.containsKey(id)

  private val srv = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = srv.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = srv.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .contains(s"Bearer $token")

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.nonEmpty).map(_.split("=", 2))
      .collect { case Array(k, v) =>
        k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap

  srv.createContext("/drive/v3/files", (ex: HttpExchange) => {
    if (!authed(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
    else {
      val segs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
      (ex.getRequestMethod, segs) match {
        case ("GET", List("drive", "v3", "files")) =>
          val q = query(ex)
          val parent = "'([^']*)' in parents".r.findFirstMatchIn(
            q.getOrElse("q", "")).map(_.group(1)).getOrElse("root")
          if (parent != "root" && !files.containsKey(parent))
            respond(ex, 404, """{"error":"folder not found"}""")
          else {
            val pageSize = q.getOrElse("pageSize", "100").toInt
            val offset = q.getOrElse("pageToken", "0").toInt
            val kids = files.values().toArray(Array.empty[SimFile])
              .filter(_.parent == parent).sortBy(_.id)
            val page = kids.slice(offset, offset + pageSize)
            val next =
              if (offset + pageSize < kids.length)
                s""","nextPageToken":"${offset + pageSize}""""
              else ""
            val items = page.map { f =>
              s"""{"id":"${f.id}","name":"${f.name}","mimeType":"${f.mime}",""" +
                s""""size":"${f.content.length}",""" +
                s""""modifiedTime":"${java.time.Instant.ofEpochMilli(f.modifiedMs)}"}"""
            }.mkString(",")
            respond(ex, 200, s"""{"files":[$items]$next}""")
          }
        case ("GET", List("drive", "v3", "files", id)) =>
          Option(files.get(id)) match {
            case Some(f) if query(ex).get("alt").contains("media") =>
              // bytes verbatim — alt=media is a binary route
              ex.sendResponseHeaders(200,
                if (f.content.isEmpty) -1 else f.content.length)
              if (f.content.nonEmpty) ex.getResponseBody.write(f.content)
              ex.close()
            case Some(_) => respond(ex, 400, """{"error":"only alt=media"}""")
            case None => respond(ex, 404, """{"error":"no such file"}""")
          }
        case ("DELETE", List("drive", "v3", "files", id)) =>
          files.remove(id)
          respond(ex, 204, "")
        case other => respond(ex, 404, s"""{"error":"no route: $other"}""")
      }
    }
  })

  srv.createContext("/analytics/v3/management", (ex: HttpExchange) => {
    if (!authed(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
    else {
      val segs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
      (ex.getRequestMethod, segs.dropWhile(_ != "unsampledReports")) match {
        case ("POST", List("unsampledReports")) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val title = JsonMethods.parse(body) \ "title" match {
            case JString(s) => s
            case other => sys.error(s"no title: $other")
          }
          val id = s"r${reportSeq.incrementAndGet()}"
          if (title.contains("fail-me"))
            respond(ex, 200, s"""{"id":"$id","status":"FAILED"}""")
          else {
            pending.put(id, (title, pollsUntilDone))
            respond(ex, 200, s"""{"id":"$id","status":"PENDING"}""")
          }
        case ("GET", List("unsampledReports", id)) =>
          statusPolls += 1
          Option(pending.get(id)) match {
            case Some((title, left)) if left > 1 =>
              pending.put(id, (title, left - 1))
              respond(ex, 200, s"""{"id":"$id","status":"PENDING"}""")
            case Some((title, _)) =>
              pending.remove(id)
              val fileId = s"drive-$id"
              addFile(fileId, s"$title.csv", reportCsv(title), "reports",
                System.currentTimeMillis())
              respond(ex, 200,
                s"""{"id":"$id","status":"COMPLETED",""" +
                  s""""downloadType":"GOOGLE_DRIVE",""" +
                  s""""driveDownloadDetails":{"documentId":"$fileId"}}""")
            case None => respond(ex, 404, """{"error":"no such report"}""")
          }
        case other => respond(ex, 404, s"""{"error":"no route: $other"}""")
      }
    }
  })

  srv.start()
}
