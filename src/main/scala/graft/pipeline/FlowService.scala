package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.state.RunLedger

/** GaaS-shaped control plane: a persisted flow-config catalog, a REST
  * API over it, and an interval scheduler — the layer the reference
  * runs as gobblin-service:
  *
  *  - FlowConfig CRUD (gobblin-service's restli FlowConfigsResource:
  *    flows are named, grouped property bags with an optional schedule
  *    and a runImmediately flag).
  *  - Orchestration (Orchestrator.java / DagProcessingEngine.java):
  *    executing a flow compiles its properties into the job DAG
  *    ([[FlowDag.fromProperties]]) and runs it node-by-node with
  *    ledger-recorded outcomes; execution status is served back from
  *    the same run ledger (the flow-statuses endpoint).
  *  - Scheduling (the reference's Quartz layer): `schedule=every:<sec>`
  *    flows fire whenever a [[FlowScheduler.tick]] observes the
  *    interval elapsed since the flow's last recorded start — the
  *    driver-side loop a deployment pins to a timer. Missed intervals
  *    collapse into ONE run (catch-up storms re-process nothing: every
  *    hop is watermark/ledger-idempotent by construction).
  *
  * Spark-first: the control plane is driver-side bookkeeping —
  * distributed work happens inside flow nodes; configs persist through
  * Hadoop's FileSystem so the catalog lives wherever the data does. */
object FlowService {

  final case class FlowConfig(name: String, props: Map[String, String],
                              schedule: Option[String] = None)

  /** File-backed config catalog: one `<name>.properties` per flow
    * (the reference's flow-spec catalog), CRUD + list. */
  final class FlowConfigStore(spark: SparkSession, dir: String) {
    private val root = new Path(dir)
    private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def fileOf(name: String): Path = {
      require(name.matches("[A-Za-z0-9_.-]+"), s"illegal flow name: $name")
      new Path(root, s"$name.properties")
    }

    def put(cfg: FlowConfig): Unit = {
      val lines = (cfg.props ++
        cfg.schedule.map("flow.schedule" -> _).toMap ++
        Map("flow.name" -> cfg.name))
        .toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n")
      val out = fs.create(fileOf(cfg.name), true)
      try out.write(lines.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }

    def get(name: String): Option[FlowConfig] = {
      val f = fileOf(name)
      if (!fs.exists(f)) return None
      val in = fs.open(f)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val props = text.linesIterator.filter(_.contains('='))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
      Some(FlowConfig(name, props - "flow.schedule", props.get("flow.schedule")))
    }

    def delete(name: String): Boolean = fs.delete(fileOf(name), false)

    def list(): Seq[String] =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.endsWith(".properties")).map(_.stripSuffix(".properties"))
        .sorted
  }

  /** Execute a stored flow now: compile properties → DAG → run, every
    * node outcome in the ledger under `<flow>@<runId>`. The separator
    * is "@" because flow names admit only `[A-Za-z0-9_.-]` — a "-"
    * separator made flow "foo"'s status query match flow "foo-bar"'s
    * runs. */
  def execute(spark: SparkSession, store: FlowConfigStore,
              ledger: RunLedger, name: String,
              runId: String): Map[String, FlowDag.NodeResult] = {
    val cfg = store.get(name).getOrElse(
      throw new IllegalArgumentException(s"no such flow: $name"))
    val nodes = FlowDag.fromProperties(cfg.props)
    require(nodes.nonEmpty, s"flow $name compiles to zero jobs")
    FlowDag.run(spark, nodes, s"$name@$runId", ledger = Some(ledger))
  }

  /** Scheduler over the catalog: `flow.schedule=every:<sec>` fires on
    * elapsed intervals; `flow.schedule=cron:<quartz-expr>` fires when a
    * [[CronSchedule]] match time passes (the reference's `job.schedule`
    * Quartz registration, JobScheduler.java:595 — a cron flow fires at
    * its match times, never immediately on startup). [[FlowScheduler
    * .tick]] is pure bookkeeping + execute — the caller owns the timer
    * (a test injects the clock); cron times are interpreted in the
    * system zone, as Quartz defaults to. */
  final class FlowScheduler(spark: SparkSession, store: FlowConfigStore,
                            ledger: RunLedger) {
    private val lastStart = scala.collection.mutable.Map.empty[String, Long]
    // cron flows track the last MATCH fired (or the first-seen tick),
    // so one fire per match time even with jittery tick cadence
    private val cronMark = scala.collection.mutable.Map.empty[String, Long]

    private[pipeline] def intervalSec(schedule: String): Long = {
      require(schedule.startsWith("every:"),
        s"unsupported schedule '$schedule' (supported: every:<seconds>, " +
          "cron:<quartz-expr>)")
      val s = schedule.stripPrefix("every:").toLong
      require(s > 0, s"schedule interval must be positive: $s")
      s
    }

    private def toLdt(ms: Long): java.time.LocalDateTime =
      java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ms), java.time.ZoneId.systemDefault())

    private def toMs(t: java.time.LocalDateTime): Long =
      t.atZone(java.time.ZoneId.systemDefault()).toInstant.toEpochMilli

    /** Is the flow due at `nowMs`, updating its bookkeeping if so. */
    private def due(name: String, schedule: String, nowMs: Long): Boolean =
      if (schedule.startsWith("cron:")) {
        val cron = CronSchedule.parse(schedule.stripPrefix("cron:"))
        val mark = cronMark.getOrElseUpdate(name, nowMs)
        cron.next(toLdt(mark)) match {
          case Some(t) if toMs(t) <= nowMs =>
            // collapse any downtime backlog: fire ONCE and continue
            // from the LATEST elapsed match (Quartz's fire-once misfire
            // policy) — advancing one match per tick would replay every
            // missed hour as a stale extra run
            var last = t
            var more = cron.next(last)
            while (more.exists(m => toMs(m) <= nowMs)) {
              last = more.get; more = cron.next(last)
            }
            cronMark(name) = toMs(last); true
          case _ => false
        }
      } else {
        val fire = lastStart.get(name)
          .forall(last => nowMs - last >= intervalSec(schedule) * 1000)
        if (fire) lastStart(name) = nowMs
        fire
      }

    /** Run every flow due at `nowMs`; returns the names that fired. A
      * failing flow does not stop the tick — its node failures are
      * already in the ledger. */
    def tick(nowMs: Long): Seq[String] = {
      val fired = Seq.newBuilder[String]
      store.list().foreach { name =>
        store.get(name).foreach { cfg =>
          cfg.schedule.foreach { sch =>
            if (due(name, sch, nowMs)) {
              fired += name
              try { execute(spark, store, ledger, name, s"sched-$nowMs"); () }
              catch { case e: Exception =>
                System.err.println(s"[flow-scheduler] $name failed: $e") }
            }
          }
        }
      }
      fired.result()
    }
  }

  /** REST face (the restli FlowConfig API's shape over the JDK server):
    *   PUT  /flowconfigs/{name}     body = flat properties JSON object
    *   GET  /flowconfigs/{name}     → the stored properties
    *   GET  /flowconfigs            → names
    *   DELETE /flowconfigs/{name}
    *   POST /flowexecutions/{name}  → runs now, returns per-node status
    *   GET  /flowstatuses/{name}    → ledger rows for the flow's jobs
    * Returns the started server (port 0 = ephemeral); caller stops it. */
  def serve(spark: SparkSession, store: FlowConfigStore, ledger: RunLedger,
            port: Int = 0): HttpServer = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    def jstr(s: String) = graft.JsonUtil.jstr(s)
    def nameOf(ex: HttpExchange, prefix: String): Option[String] = {
      val rest = ex.getRequestURI.getPath.stripPrefix(prefix)
      if (rest.isEmpty || rest == "/") None else Some(rest.stripPrefix("/"))
    }
    srv.createContext("/flowconfigs", (ex: HttpExchange) => {
      try (ex.getRequestMethod, nameOf(ex, "/flowconfigs")) match {
        case ("GET", None) =>
          respond(ex, 200, store.list().map(jstr).mkString("[", ",", "]"))
        case ("GET", Some(n)) => store.get(n) match {
          case Some(cfg) =>
            val all = cfg.props ++ cfg.schedule.map("flow.schedule" -> _)
            respond(ex, 200, all.toSeq.sorted
              .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
              .mkString("{", ",", "}"))
          case None => respond(ex, 404, "")
        }
        case ("PUT", Some(n)) =>
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val props = JsonMethods.parse(body) match {
            case JObject(fields) => fields.collect {
              case (k, JString(v)) => k -> v }.toMap
            case other => sys.error(s"flow config must be a JSON object: $other")
          }
          store.put(FlowConfig(n, props - "flow.schedule",
            props.get("flow.schedule")))
          respond(ex, 200, "{\"created\":" + jstr(n) + "}")
        case ("DELETE", Some(n)) =>
          respond(ex, if (store.delete(n)) 200 else 404, "")
        case _ => respond(ex, 405, "")
      } catch { case e: Exception => respond(ex, 400, s"""{"error":${jstr(e.getMessage)}}""") }
    })
    srv.createContext("/flowexecutions", (ex: HttpExchange) => {
      try (ex.getRequestMethod, nameOf(ex, "/flowexecutions")) match {
        case ("POST", Some(n)) =>
          val res = execute(spark, store, ledger, n,
            java.util.UUID.randomUUID().toString.take(8))
          respond(ex, 200, res.toSeq.sortBy(_._1).map { case (job, r) =>
            s"${jstr(job)}:${jstr(r.status.toString)}"
          }.mkString("{", ",", "}"))
        case _ => respond(ex, 405, "")
      } catch { case e: Exception => respond(ex, 400, s"""{"error":${jstr(e.getMessage)}}""") }
    })
    srv.createContext("/flowstatuses", (ex: HttpExchange) => {
      try (ex.getRequestMethod, nameOf(ex, "/flowstatuses")) match {
        case ("GET", Some(n)) =>
          val rows = ledger.history
            .filter(org.apache.spark.sql.functions
              .col("run_id").startsWith(s"$n@"))
            .select("job", "run_id", "status").collect()
          respond(ex, 200, rows.toSeq.map(r =>
            s"""{"job":${jstr(r.getString(0))},"run":${jstr(r.getString(1))},""" +
              s""""status":${jstr(r.getString(2))}}""").mkString("[", ",", "]"))
        case _ => respond(ex, 405, "")
      } catch { case e: Exception => respond(ex, 400, s"""{"error":${jstr(e.getMessage)}}""") }
    })
    srv.start()
    srv
  }
}
