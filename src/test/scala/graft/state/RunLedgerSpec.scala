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
}
