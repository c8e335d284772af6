package graft.pipeline

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.pipeline.AzkabanClient._

/** In-process Azkaban web server speaking the AJAX dialect (the
  * q101-family zero-egress pattern): login sessions, project CRUD,
  * multipart zip upload (unzipped and RETAINED so tests assert the
  * compiled project content arrived intact), cron schedules,
  * executions. Azkaban-style errors: HTTP 200 with an "error" field. */
class AzkabanClientSpec extends SparkSpec {

  private final class AzkabanSim(user: String, password: String) {
    val sessions = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val projects = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val uploads = new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()
    val schedules = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val execs = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private val seq = new java.util.concurrent.atomic.AtomicInteger()

    private val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def baseUrl: String = s"http://127.0.0.1:${srv.getAddress.getPort}"
    def stop(): Unit = srv.stop(0)

    private def respond(ex: HttpExchange, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    }

    private def formOf(s: String): Map[String, String] =
      s.split('&').filter(_.nonEmpty).map(_.split("=", 2)).collect {
        case Array(k, v) => URLDecoder.decode(k, "UTF-8") ->
          URLDecoder.decode(v, "UTF-8")
      }.toMap

    private def sessionOk(p: Map[String, String]): Boolean =
      p.get("session.id").exists(sessions.containsKey)

    srv.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val p = formOf(body)
      if (p.get("action").contains("login")) {
        if (p.get("username").contains(user) &&
            p.get("password").contains(password)) {
          val sid = s"sess-${seq.incrementAndGet()}"
          sessions.put(sid, user)
          respond(ex, s"""{"session.id":"$sid","status":"success"}""")
        } else respond(ex, """{"error":"Incorrect Login."}""")
      } else respond(ex, """{"error":"unknown action"}""")
    })

    srv.createContext("/manager", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val ct = Option(ex.getRequestHeaders.getFirst("Content-Type"))
        .getOrElse("")
      if (ct.startsWith("multipart/form-data")) {
        // zip upload: parse parts byte-safely via ISO_8859_1
        val boundary = "--" + ct.split("boundary=")(1)
        val raw = new String(ex.getRequestBody.readAllBytes(), ISO_8859_1)
        val parts = raw.split(java.util.regex.Pattern.quote(boundary))
          .filter(_.contains("Content-Disposition"))
        def partNamed(n: String): Option[String] = parts
          .find(_.contains(s"""name="$n""""))
          .map(_.split("\r\n\r\n", 2)(1).stripSuffix("\r\n"))
        if (!partNamed("session.id").exists(sessions.containsKey))
          respond(ex, """{"error":"session expired"}""")
        else {
          val project = partNamed("project").get
          val zipBytes = partNamed("file").get.getBytes(ISO_8859_1)
          uploads.put(project, AzkabanClient.unzip(zipBytes))
          respond(ex, s"""{"projectId":"${projects.get(project)}","version":"1"}""")
        }
      } else if (q.contains("action=create")) {
        val p = formOf(new String(ex.getRequestBody.readAllBytes(), UTF_8))
        if (!sessionOk(p)) respond(ex, """{"error":"session expired"}""")
        else if (projects.containsKey(p("name")))
          // real Azkaban refuses duplicate names — re-push must tolerate
          respond(ex, s"""{"error":"Project ${p("name")} already exists."}""")
        else {
          projects.put(p("name"), seq.incrementAndGet())
          respond(ex, """{"status":"success"}""")
        }
      } else { // GET ajax routes
        val p = formOf(q)
        if (!sessionOk(p)) respond(ex, """{"error":"session expired"}""")
        else if (p.get("ajax").contains("fetchprojectflows"))
          Option(projects.get(p("project"))) match {
            case Some(id) => respond(ex, s"""{"projectId":"$id"}""")
            case None => respond(ex, s"""{"error":"no project ${p("project")}"}""")
          }
        else respond(ex, """{"error":"unknown ajax"}""")
      }
    })

    srv.createContext("/schedule", (ex: HttpExchange) => {
      val p = formOf(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      if (!sessionOk(p)) respond(ex, """{"error":"session expired"}""")
      else {
        val sid = s"sched-${seq.incrementAndGet()}"
        schedules.put(s"${p("projectName")}/${p("flow")}", p("cronExpression"))
        respond(ex, s"""{"scheduleId":"$sid","status":"success"}""")
      }
    })

    srv.createContext("/executor", (ex: HttpExchange) => {
      val p = formOf(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
      if (!sessionOk(p)) respond(ex, """{"error":"session expired"}""")
      else if (p.get("ajax").contains("executeFlow")) {
        val eid = s"exec-${seq.incrementAndGet()}"
        execs.put(eid, "SUCCEEDED")
        respond(ex, s"""{"execid":"$eid"}""")
      } else if (p.get("ajax").contains("fetchexecflow"))
        respond(ex, s"""{"status":"${execs.get(p("execid"))}"}""")
      else respond(ex, """{"error":"unknown ajax"}""")
    })

    srv.start()
  }

  private val http = java.net.http.HttpClient.newHttpClient()

  test("login yields a session; wrong credentials are an Azkaban-style error") {
    val sim = new AzkabanSim("ops", "pw1")
    try {
      val cfg = AzkabanConfig(sim.baseUrl, "ops", "pw1")
      val sid = login(cfg, http)
      assert(sid.startsWith("sess-"))
      val e = intercept[IllegalStateException] {
        login(AzkabanConfig(sim.baseUrl, "ops", "WRONG"), http)
      }
      assert(e.getMessage.contains("Incorrect Login"), e.getMessage)
    } finally sim.stop()
  }

  test("create + upload + schedule + execute lifecycle against the dialect") {
    val sim = new AzkabanSim("ops", "pw1")
    try {
      val cfg = AzkabanConfig(sim.baseUrl, "ops", "pw1")
      val sid = login(cfg, http)
      createProject(cfg, http, sid, "nightly", "demo")
      val files = Map("a.job" -> "type=command\ncommand=echo a\n",
        "b.job" -> "type=command\ndependencies=a\ncommand=echo b\n")
      val (pid, ver) = uploadZip(cfg, http, sid, "nightly",
        AzkabanClient.zip(files))
      assert(pid.nonEmpty && ver == "1")
      assert(sim.uploads.get("nightly") == files,
        "the zip must arrive byte-exactly and unzip to the same job files")
      assert(getProjectId(cfg, http, sid, "nightly") == pid)
      val schedId = scheduleCronFlow(cfg, http, sid, "nightly", "b",
        "0 0 2 * * ?")
      assert(schedId.startsWith("sched-"))
      assert(sim.schedules.get("nightly/b") == "0 0 2 * * ?")
      // a cron the local validator refuses never reaches the cluster
      intercept[IllegalArgumentException] {
        scheduleCronFlow(cfg, http, sid, "nightly", "b", "not a cron")
      }
      val eid = executeFlow(cfg, http, sid, "nightly", "b")
      assert(fetchExecStatus(cfg, http, sid, eid) == "SUCCEEDED")
      // a stale session is an Azkaban-style 200-with-error -> loud
      val e = intercept[IllegalStateException] {
        executeFlow(cfg, http, "sess-bogus", "nightly", "b")
      }
      assert(e.getMessage.contains("session"), e.getMessage)
    } finally sim.stop()
  }

  test("orchestrator pushes a stored flow as a compiled project with dependencies") {
    val sim = new AzkabanSim("ops", "pw1")
    try {
      val dir = tmpDir("azk-push")
      val store = new FlowService.FlowConfigStore(spark, s"$dir/catalog")
      val props = Map(
        "job.1.job.name" -> "extract",
        "job.1.source.format" -> "parquet",
        "job.1.source.path" -> s"$sf/region.parquet",
        "job.1.fork.1.name" -> "main",
        "job.1.fork.1.out" -> s"$dir/hop1",
        "job.2.job.name" -> "load",
        "job.2.dependsOn" -> "extract",
        "job.2.source.format" -> "parquet",
        "job.2.source.path" -> s"$dir/hop1",
        "job.2.fork.1.name" -> "main",
        "job.2.fork.1.out" -> s"$dir/hop2")
      store.put(FlowService.FlowConfig("nightly", props,
        Some("cron:0 30 1 * * ?")))
      val pushed = AzkabanOrchestrator.push(
        AzkabanConfig(sim.baseUrl, "ops", "pw1"), store, "nightly",
        "graft-run")
      assert(pushed.jobFiles == Set("extract.job", "load.job"))
      val uploaded = sim.uploads.get("nightly")
      assert(uploaded("load.job").contains("dependencies=extract"),
        uploaded.toString)
      assert(uploaded("extract.job").contains(
        "command=graft-run --flow nightly --job extract"))
      assert(uploaded.values.forall(_.startsWith("type=command")))
      // the cron schedule landed on the terminal job's flow
      assert(pushed.scheduleId.isDefined)
      assert(sim.schedules.get("nightly/load") == "0 30 1 * * ?")
      // re-pushing an UPDATED flow is the normal lifecycle: the
      // duplicate-name create error is tolerated and the new zip lands
      val pushed2 = AzkabanOrchestrator.push(
        AzkabanConfig(sim.baseUrl, "ops", "pw1"), store, "nightly",
        "graft-run-v2")
      assert(pushed2.jobFiles == pushed.jobFiles)
      assert(sim.uploads.get("nightly")("extract.job")
        .contains("command=graft-run-v2"), "the updated project must land")
    } finally sim.stop()
  }
}
