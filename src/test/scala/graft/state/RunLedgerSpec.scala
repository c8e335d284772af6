package graft.state

import graft.SparkSpec
import graft.pipeline.PipelineRunner.JobResult

class RunLedgerSpec extends SparkSpec {

  test("records runs immutably and reads them back as a frame") {
    val ledger = new RunLedger(spark, tmpDir("ledger"))
    ledger.recordResult("ingest",
      JobResult("r1", extracted = 100, rejected = 3,
        branchCounts = Map("main" -> 97), committedWatermark = Some("42")),
      startedAtMs = 1000, finishedAtMs = 2000)
    ledger.record("ingest", "r2", "FAILED", 3000, 3500,
      detail = "boom: source missing")
    val h = ledger.history.collect().map(r =>
      (r.getAs[String]("run_id"), r.getAs[String]("status"))).toSet
    assert(h == Set(("r1", "SUCCEEDED"), ("r2", "FAILED")))
    val ok = ledger.history.filter("run_id = 'r1'").head()
    assert(ok.getAs[Long]("extracted") == 100)
    assert(ok.getAs[String]("committed_watermark") == "42")
  }

  test("monitoring views: latest per job, unhealthy feed, SLA breaches") {
    val ledger = new RunLedger(spark, tmpDir("ledger-mon"))
    ledger.record("jobA", "a1", "SUCCEEDED", 1000, 2000)
    ledger.record("jobA", "a2", "FAILED", 3000, 3100, detail = "x")
    ledger.record("jobB", "b1", "SUCCEEDED", 1000, 9000)
    ledger.record("jobB", "b2", "COMMITTED_PARTIAL", 10000, 10500,
      detail = "failed branches: audit: boom")
    val latest = ledger.latestRuns.collect()
      .map(r => r.getAs[String]("job") -> r.getAs[String]("run_id")).toMap
    assert(latest == Map("jobA" -> "a2", "jobB" -> "b2"))
    val unhealthy = ledger.unhealthySince(3000).collect()
      .map(_.getAs[String]("run_id")).toSet
    assert(unhealthy == Set("a2", "b2")) // partial commits need attention too
    val slow = ledger.slaBreaches(maxMs = 1000).collect()
    assert(slow.map(_.getAs[String]("run_id")).toSeq == Seq("b1"))
    assert(slow.head.getAs[Long]("duration_ms") == 8000)
  }

  test("re-recording a runId fails loudly; ledger keeps the original") {
    val ledger = new RunLedger(spark, tmpDir("ledger-dup"))
    ledger.record("j", "run-9", "SUCCEEDED", 1, 2)
    intercept[java.io.IOException] {
      ledger.record("j", "run-9", "FAILED", 3, 4)
    }
    assert(ledger.history.count() == 1)
    assert(ledger.history.head().getAs[String]("status") == "SUCCEEDED")
  }

  test("empty ledger is column-addressable (fixed schema, zero rows)") {
    val ledger = new RunLedger(spark, tmpDir("ledger-empty"))
    assert(ledger.history.count() == 0)
    // monitoring queries must resolve before the first run is recorded
    assert(ledger.history.filter("status = 'FAILED'").count() == 0)
    assert(ledger.history.schema == RunLedger.schema)
  }

  test("countDrift flags a spike against the trailing median, spares the rest") {
    import spark.implicits._
    val h = Seq(10L, 12L, 11L, 13L, 12L, 50L, 12L, 11L).zipWithIndex
      .map { case (n, i) => ("j1", i.toLong, n) }
      .toDF("job", "finished_at_ms", "extracted")
    val out = RunLedger.countDrift(h, Seq("job"), "finished_at_ms",
      "extracted", trailing = 4, tolerancePct = 30)
      .orderBy("finished_at_ms")
      .collect().map(r => (r.getLong(1), r.getAs[Any]("baseline_med2"),
        r.getBoolean(r.fieldIndex("drifted"))))
    assert(out(0)._2 == null && !out(0)._3, "first row has no baseline")
    assert(out(5)._3, "the 50-row spike must drift vs median ~12")
    assert(out.count(_._3) == 1, s"only the spike drifts: ${out.toSeq}")
    // the run AFTER the spike is judged against a window containing the
    // spike but the MEDIAN absorbs it (that's why it's not a mean)
    assert(!out(6)._3)
  }

  test("countDrift series are key-isolated and tolerance is monotonic") {
    import spark.implicits._
    val h = (Seq.tabulate(6)(i => ("big", i.toLong, 1000L + i)) ++
      Seq.tabulate(6)(i => ("small", i.toLong, 10L + i)))
      .toDF("job", "finished_at_ms", "extracted")
    // keys don't contaminate each other: neither steady series drifts
    val tight = RunLedger.countDrift(h, Seq("job"), "finished_at_ms",
      "extracted", trailing = 3, tolerancePct = 40)
    assert(tight.filter("drifted").count() == 0)
    // a spike flagged at 100% tolerance is also flagged at 10%
    val spiky = h.union(Seq(("small", 6L, 500L)).toDF())
    def flags(pct: Int) = RunLedger.countDrift(spiky, Seq("job"),
      "finished_at_ms", "extracted", 3, pct)
      .filter("drifted").select("finished_at_ms").collect()
      .map(_.getLong(0)).toSet
    assert(flags(100).subsetOf(flags(10)))
    assert(flags(100) == Set(6L))
  }
}
