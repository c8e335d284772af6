package graft.pipeline

import java.io.ByteArrayOutputStream
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sinks.HttpSink

/** Azkaban AJAX-API orchestration — how a control plane pushes flows
  * onto an Azkaban executor cluster. Reference:
  * AzkabanAjaxAPIClient.java (gobblin-modules/gobblin-azkaban/.../
  * orchestration/): `action=login` POST yields a `session.id` that
  * rides every later call (:92); project id comes from
  * `ajax=fetchprojectflows` (:106); `/manager?action=create` makes the
  * project; the project ZIP of `.job` property files uploads as
  * multipart `ajax=upload` (:388); `/schedule` takes `ajax=
  * scheduleFlow`/`scheduleCronFlow`; `/executor` takes
  * `ajax=executeFlow` and `ajax=fetchexecflow`. Azkaban signals errors
  * as 200s with an `"error"` field — every response is checked for it
  * (the reference's handleResponse).
  *
  * [[AzkabanOrchestrator]] is the GaaS face: compile a stored flow
  * config ([[FlowService.FlowConfigStore]]) into the Azkaban project
  * shape — one `.job` file per DAG node, `dependencies=` from the
  * dag edges, `type=command` invoking the runner — zip it in memory,
  * create/upload/schedule. Cron expressions are validated LOCALLY with
  * [[CronSchedule]] before submission, so a bad schedule fails in the
  * control plane, not on the cluster.
  *
  * All driver-side control flow (like every launcher face here): the
  * distributed work happens inside the flow's jobs, wherever they
  * run. */
object AzkabanClient {

  final case class AzkabanConfig(baseUrl: String, user: String,
                                 password: String,
                                 http: HttpSink.HttpConfig =
                                   HttpSink.HttpConfig(url = ""))

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  private def form(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")

  private def checkError(body: String): JValue = {
    val j = JsonMethods.parse(body)
    j \ "error" match {
      case JString(e) => throw new IllegalStateException(s"Azkaban error: $e")
      case _ => j
    }
  }

  private def str(j: JValue, f: String): String = j \ f match {
    case JString(s) => s
    case JInt(i) => i.toString
    case other => throw new IllegalArgumentException(
      s"Azkaban response missing '$f': $other")
  }

  private def post(c: AzkabanConfig, client: java.net.http.HttpClient,
                   path: String, params: Map[String, String]): JValue = {
    val cfg = c.http.copy(url = s"${c.baseUrl}$path",
      headers = c.http.headers +
        ("Content-Type" -> "application/x-www-form-urlencoded"))
    checkError(HttpSink.send(client, cfg, "POST", Some(form(params))))
  }

  private def get(c: AzkabanConfig, client: java.net.http.HttpClient,
                  path: String, params: Map[String, String]): JValue = {
    val cfg = c.http.copy(url = s"${c.baseUrl}$path?${form(params)}")
    checkError(HttpSink.send(client, cfg, "GET", None))
  }

  /** `action=login` → session id (valid until expiry; re-login always
    * overrides, as Azkaban documents). */
  def login(c: AzkabanConfig, client: java.net.http.HttpClient): String =
    str(post(c, client, "/", Map("action" -> "login",
      "username" -> c.user, "password" -> c.password)), "session.id")

  def getProjectId(c: AzkabanConfig, client: java.net.http.HttpClient,
                   session: String, project: String): String =
    str(get(c, client, "/manager", Map("ajax" -> "fetchprojectflows",
      "session.id" -> session, "project" -> project)), "projectId")

  def createProject(c: AzkabanConfig, client: java.net.http.HttpClient,
                    session: String, name: String,
                    description: String): Unit = {
    post(c, client, "/manager?action=create", Map("session.id" -> session,
      "name" -> name, "description" -> description))
    ()
  }

  /** The reference's createAzkabanProjectIfNotExists: Azkaban answers
    * an error for a duplicate name, but re-pushing an updated flow IS
    * the normal lifecycle (updates are an upload to the existing
    * project) — tolerate exactly that error and proceed. */
  def createProjectIfNotExists(c: AzkabanConfig,
                               client: java.net.http.HttpClient,
                               session: String, name: String,
                               description: String): Unit =
    try createProject(c, client, session, name, description)
    catch {
      case e: IllegalStateException
          if e.getMessage != null &&
            e.getMessage.toLowerCase.contains("already exists") => ()
    }

  /** Multipart `ajax=upload` of the project zip; returns (projectId,
    * version). The multipart body is assembled by hand — four text
    * parts and one application/zip file part, exactly the shape the
    * reference builds with HttpMime (:387). */
  def uploadZip(c: AzkabanConfig, client: java.net.http.HttpClient,
                session: String, project: String,
                zipBytes: Array[Byte]): (String, String) = {
    val boundary = s"----graft${java.util.UUID.randomUUID().toString.take(8)}"
    val bos = new ByteArrayOutputStream()
    def textPart(name: String, value: String): Unit =
      bos.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        s"""name="$name"\r\n\r\n$value\r\n""").getBytes(UTF_8))
    textPart("session.id", session)
    textPart("ajax", "upload")
    textPart("project", project)
    bos.write((s"--$boundary\r\nContent-Disposition: form-data; " +
      s"""name="file"; filename="$project.zip"\r\n""" +
      "Content-Type: application/zip\r\n\r\n").getBytes(UTF_8))
    bos.write(zipBytes)
    bos.write(s"\r\n--$boundary--\r\n".getBytes(UTF_8))
    // the zip is BINARY — build this one request directly with a
    // byte-array publisher (the shared string-body helper would re-encode
    // through UTF-8 and corrupt it)
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"${c.baseUrl}/manager"))
      .header("Content-Type", s"multipart/form-data; boundary=$boundary")
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofByteArray(bos.toByteArray))
      .build()
    val httpResp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(httpResp.statusCode() / 100 == 2,
      s"upload failed: HTTP ${httpResp.statusCode()}: ${httpResp.body().take(200)}")
    val resp = checkError(httpResp.body())
    (str(resp, "projectId"), str(resp, "version"))
  }

  /** `ajax=scheduleCronFlow` — the Quartz-cron schedule route; the
    * expression is validated locally first so a malformed cron fails
    * here, not on the cluster. */
  def scheduleCronFlow(c: AzkabanConfig, client: java.net.http.HttpClient,
                       session: String, project: String, flow: String,
                       cronExpression: String): String = {
    CronSchedule.parse(cronExpression) // loud local validation
    str(post(c, client, "/schedule", Map("ajax" -> "scheduleCronFlow",
      "session.id" -> session, "projectName" -> project, "flow" -> flow,
      "cronExpression" -> cronExpression)), "scheduleId")
  }

  def executeFlow(c: AzkabanConfig, client: java.net.http.HttpClient,
                  session: String, project: String, flow: String): String =
    str(get(c, client, "/executor", Map("ajax" -> "executeFlow",
      "session.id" -> session, "project" -> project, "flow" -> flow)),
      "execid")

  def fetchExecStatus(c: AzkabanConfig, client: java.net.http.HttpClient,
                      session: String, execId: String): String =
    str(get(c, client, "/executor", Map("ajax" -> "fetchexecflow",
      "session.id" -> session, "execid" -> execId)), "status")

  // ---- project compilation ----

  /** One `.job` properties file per DAG node: `type=command`, the
    * runner command parameterized with the flow/job names, and
    * `dependencies=` from the dag edges — the Azkaban project shape
    * the reference zips (AzkabanProjectConfig). */
  def jobFiles(flowName: String, nodes: Seq[FlowDag.DagNode],
               runnerCommand: String): Map[String, String] =
    nodes.map { n =>
      val deps =
        if (n.dependsOn.isEmpty) ""
        else s"dependencies=${n.dependsOn.mkString(",")}\n"
      s"${n.name}.job" ->
        (s"type=command\n$deps" +
          s"command=$runnerCommand --flow $flowName --job ${n.name}\n")
    }.toMap

  def zip(files: Map[String, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    files.toSeq.sortBy(_._1).foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  def unzip(bytes: Array[Byte]): Map[String, String] = {
    val z = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, String]
    var e = z.getNextEntry
    while (e != null) {
      out += e.getName -> new String(z.readAllBytes(), UTF_8)
      e = z.getNextEntry
    }
    out.result()
  }
}

/** The GaaS push: stored flow config → Azkaban project. */
object AzkabanOrchestrator {
  import AzkabanClient._

  final case class Pushed(projectId: String, version: String,
                          scheduleId: Option[String], jobFiles: Set[String])

  /** Compile the stored flow to `.job` files, create + upload the
    * project, and schedule it when the flow carries
    * `flow.schedule=cron:<expr>` (interval schedules stay local — the
    * in-process [[FlowService.FlowScheduler]] owns those). */
  def push(c: AzkabanConfig, store: FlowService.FlowConfigStore,
           flowName: String, runnerCommand: String): Pushed = {
    val cfg = store.get(flowName).getOrElse(
      throw new IllegalArgumentException(s"no such flow: $flowName"))
    val nodes = FlowDag.fromProperties(cfg.props)
    require(nodes.nonEmpty, s"flow $flowName compiles to zero jobs")
    FlowDag.topoOrder(nodes) // validate the dag before shipping it anywhere
    val files = jobFiles(flowName, nodes, runnerCommand)
    val client = java.net.http.HttpClient.newHttpClient()
    val session = login(c, client)
    createProjectIfNotExists(c, client, session, flowName,
      s"graft flow $flowName")
    val (pid, version) = uploadZip(c, client, session, flowName,
      AzkabanClient.zip(files))
    val sched = cfg.schedule.filter(_.startsWith("cron:")).map(s =>
      scheduleCronFlow(c, client, session, flowName,
        // Azkaban runs the terminal job's flow; the flow name on the
        // cluster is the LAST job in topological order
        FlowDag.topoOrder(nodes).last.name, s.stripPrefix("cron:")))
    Pushed(pid, version, sched, files.keySet)
  }
}
