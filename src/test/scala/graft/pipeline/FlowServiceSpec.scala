package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec
import graft.state.RunLedger

class FlowServiceSpec extends SparkSpec {

  private def req(method: String, url: String, body: Option[String] = None)
      : (Int, String) = {
    val c = HttpClient.newHttpClient()
    val b = HttpRequest.newBuilder(URI.create(url)).method(method,
      body.fold(HttpRequest.BodyPublishers.noBody())(
        HttpRequest.BodyPublishers.ofString(_)))
    val r = c.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def flowJson(in: String, out: String): String = {
    val props = Map(
      "flow.name" -> "demo",
      "job.1.job.name" -> "extract",
      "job.1.source.format" -> "parquet",
      "job.1.source.path" -> in,
      "job.1.fork.1.name" -> "main",
      "job.1.fork.1.out" -> s"$out/hop1",
      "job.2.job.name" -> "load",
      "job.2.dependsOn" -> "extract",
      "job.2.source.format" -> "parquet",
      "job.2.source.path" -> s"$out/hop1",
      "job.2.fork.1.name" -> "main",
      "job.2.fork.1.filter" -> "n_regionkey = 0",
      "job.2.fork.1.out" -> s"$out/hop2")
    props.map { case (k, v) =>
      s"${graft.JsonUtil.jstr(k)}:${graft.JsonUtil.jstr(v)}" }
      .mkString("{", ",", "}")
  }

  test("REST control plane: config CRUD, trigger execution, ledger-backed status") {
    val dir = tmpDir("flowsvc")
    val store = new FlowService.FlowConfigStore(spark, s"$dir/catalog")
    val ledger = new RunLedger(spark, s"$dir/ledger")
    val srv = FlowService.serve(spark, store, ledger)
    val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
    try {
      // create over REST
      val (c1, _) = req("PUT", s"$base/flowconfigs/nightly",
        Some(flowJson(s"$sf/nation.parquet", dir)))
      assert(c1 == 200)
      val (_, listed) = req("GET", s"$base/flowconfigs")
      assert(JsonMethods.parse(listed) == JArray(List(JString("nightly"))))
      // read back the stored properties
      val (c2, got) = req("GET", s"$base/flowconfigs/nightly")
      assert(c2 == 200)
      assert((JsonMethods.parse(got) \ "job.2.dependsOn") == JString("extract"))
      // trigger an execution over REST
      val (c3, execd) = req("POST", s"$base/flowexecutions/nightly")
      assert(c3 == 200, execd)
      val statuses = JsonMethods.parse(execd) match {
        case JObject(fields) => fields.collect {
          case (k, JString(v)) => k -> v }.toMap
        case other => sys.error(s"$other")
      }
      assert(statuses == Map("extract" -> "Succeeded", "load" -> "Succeeded"))
      // the data actually moved through both hops
      val expect = spark.read.parquet(s"$sf/nation.parquet")
        .filter("n_regionkey = 0").count()
      assert(spark.read.parquet(s"$dir/hop2").count() == expect)
      // status endpoint serves the ledger rows for this flow
      val (c4, st) = req("GET", s"$base/flowstatuses/nightly")
      assert(c4 == 200)
      val rows = JsonMethods.parse(st) match {
        case JArray(items) => items.map(o =>
          ((o \ "job").asInstanceOf[JString].s,
            (o \ "status").asInstanceOf[JString].s))
        case other => sys.error(s"$other")
      }
      assert(rows.toSet == Set("extract" -> "SUCCEEDED", "load" -> "SUCCEEDED"))
      // a flow whose name extends another's ("nightly-eu") must not
      // leak into "nightly"'s statuses — the run-id separator ("@",
      // illegal in flow names) keeps the prefix filter unambiguous
      req("PUT", s"$base/flowconfigs/nightly-eu",
        Some(flowJson(s"$sf/nation.parquet", s"$dir/eu")))
      assert(req("POST", s"$base/flowexecutions/nightly-eu")._1 == 200)
      val (_, stEu) = req("GET", s"$base/flowstatuses/nightly")
      val euRuns = JsonMethods.parse(stEu) match {
        case JArray(items) => items.map(o => (o \ "run").asInstanceOf[JString].s)
        case other => sys.error(s"$other")
      }
      assert(euRuns.nonEmpty && euRuns.forall(_.startsWith("nightly@")),
        s"flowstatuses/nightly leaked other flows' runs: $euRuns")
      // unknown flow: loud 400 on execute, 404 on get; delete works
      val (c5, _) = req("POST", s"$base/flowexecutions/nope")
      assert(c5 == 400)
      assert(req("GET", s"$base/flowconfigs/nope")._1 == 404)
      assert(req("DELETE", s"$base/flowconfigs/nightly")._1 == 200)
      assert(req("GET", s"$base/flowconfigs/nightly")._1 == 404)
    } finally srv.stop(0)
  }

  test("interval scheduler fires due flows once per elapsed interval") {
    val dir = tmpDir("flowsched")
    val store = new FlowService.FlowConfigStore(spark, s"$dir/catalog")
    val ledger = new RunLedger(spark, s"$dir/ledger")
    val props = Map(
      "job.1.job.name" -> "copy",
      "job.1.source.format" -> "parquet",
      "job.1.source.path" -> s"$sf/region.parquet",
      "job.1.fork.1.name" -> "main",
      "job.1.fork.1.out" -> s"$dir/out")
    store.put(FlowService.FlowConfig("pulse", props, Some("every:60")))
    store.put(FlowService.FlowConfig("manual", props, None)) // never fires
    val sched = new FlowService.FlowScheduler(spark, store, ledger)
    val t0 = 1000000000L
    assert(sched.tick(t0) == Seq("pulse"), "first tick fires")
    assert(sched.tick(t0 + 30000).isEmpty, "30s later: not due")
    assert(sched.tick(t0 + 60000) == Seq("pulse"), "60s later: due again")
    assert(spark.read.parquet(s"$dir/out").count() ==
      spark.read.parquet(s"$sf/region.parquet").count())
    // two recorded runs in the ledger
    val runs = ledger.history
      .filter("job = 'copy'").select("run_id").collect().map(_.getString(0))
    assert(runs.length == 2 && runs.forall(_.startsWith("pulse@sched-")), runs.toSeq.toString)
    // malformed schedules refuse loudly
    val e = intercept[IllegalArgumentException] { sched.intervalSec("hourly") }
    assert(e.getMessage.contains("unsupported schedule"))
  }

  test("cron-scheduled flows fire at match times, once per match, never at startup") {
    val dir = tmpDir("flowcron")
    val store = new FlowService.FlowConfigStore(spark, s"$dir/catalog")
    val ledger = new RunLedger(spark, s"$dir/ledger")
    val props = Map(
      "job.1.job.name" -> "copy",
      "job.1.source.format" -> "parquet",
      "job.1.source.path" -> s"$sf/region.parquet",
      "job.1.fork.1.name" -> "main",
      "job.1.fork.1.out" -> s"$dir/out")
    // hourly on the hour (seconds-aware Quartz shape)
    store.put(FlowService.FlowConfig("tick", props, Some("cron:0 0 * * * ?")))
    val sched = new FlowService.FlowScheduler(spark, store, ledger)
    val zone = java.time.ZoneId.systemDefault()
    def ms(s: String) = java.time.LocalDateTime.parse(s).atZone(zone)
      .toInstant.toEpochMilli
    // startup mid-hour: nothing due yet (cron fires at matches, not now)
    assert(sched.tick(ms("2024-03-01T10:20:00")).isEmpty, "no startup fire")
    assert(sched.tick(ms("2024-03-01T10:50:00")).isEmpty, "still mid-hour")
    // the 11:00 match passed -> exactly one fire, even on a late tick
    assert(sched.tick(ms("2024-03-01T11:03:00")) == Seq("tick"))
    assert(sched.tick(ms("2024-03-01T11:04:00")).isEmpty, "one fire per match")
    // next hour fires again
    assert(sched.tick(ms("2024-03-01T12:00:30")) == Seq("tick"))
    // 6 hours of downtime: the backlog COLLAPSES to one fire (Quartz's
    // fire-once misfire policy), not six stale replays over six ticks
    assert(sched.tick(ms("2024-03-01T18:10:00")) == Seq("tick"))
    assert(sched.tick(ms("2024-03-01T18:11:00")).isEmpty,
      "missed matches must not replay one-per-tick")
    assert(sched.tick(ms("2024-03-01T19:00:05")) == Seq("tick"),
      "the schedule continues from now")
    // a malformed cron surfaces as a loud refusal at parse
    intercept[IllegalArgumentException] {
      CronSchedule.parse("not a cron")
    }
  }
}
