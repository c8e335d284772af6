package graft.metrics

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  test("counter updates propagate to every ancestor context") {
    val root = MetricContext.root("job")
    val task = root.childContext("task1")
    val fork = task.childContext("fork0")
    fork.counter("records.written").inc(7)
    task.counter("records.written").inc(3)
    assert(fork.counterValue("records.written") == 7)
    assert(task.counterValue("records.written") == 10)
    assert(root.counterValue("records.written") == 10)
    assert(fork.fullName == "job.task1.fork0")
  }

  test("childContext is idempotent and tags accumulate") {
    val root = MetricContext.root("job", Map("cluster" -> "c1"))
    val a1 = root.childContext("t", Map("task" -> "t"))
    val a2 = root.childContext("t")
    assert(a1 eq a2)
    assert(a1.tags == Map("cluster" -> "c1", "task" -> "t"))
  }

  test("timer tracks count/total/max and propagates") {
    val root = MetricContext.root("job")
    val child = root.childContext("stage")
    child.timer("time.write").update(5000)
    child.timer("time.write").update(11000)
    val s = child.timerSnapshot("time.write").get
    assert(s.count == 2 && s.totalNanos == 16000 && s.maxNanos == 11000)
    assert(root.timerSnapshot("time.write").get.count == 2)
  }

  test("gauges are last-write-wins and do not propagate") {
    val root = MetricContext.root("job")
    val c = root.childContext("s")
    c.gauge("queue.depth", 4)
    c.gauge("queue.depth", 9)
    assert(c.gaugeValue("queue.depth").contains(9))
    assert(root.gaugeValue("queue.depth").isEmpty)
  }

  test("events bubble to listeners attached at any ancestor") {
    val root = MetricContext.root("job")
    val leaf = root.childContext("t").childContext("f")
    val atRoot = scala.collection.mutable.ListBuffer.empty[String]
    val atLeaf = scala.collection.mutable.ListBuffer.empty[String]
    root.addEventListener(e => atRoot += e.name)
    leaf.addEventListener(e => atLeaf += e.name)
    leaf.submitEvent(TrackingEvent("graft", "TaskCompleted", 1L))
    root.submitEvent(TrackingEvent("graft", "JobCompleted", 2L))
    assert(atRoot.toList == List("TaskCompleted", "JobCompleted"))
    assert(atLeaf.toList == List("TaskCompleted")) // root events don't flow down
  }

  test("snapshotRecursive flattens the tree deterministically") {
    val root = MetricContext.root("job")
    root.childContext("b").counter("n").inc(1)
    root.childContext("a").counter("n").inc(2)
    val snap = root.snapshotRecursive()
    assert(snap.map(_.context) == Seq("job", "job.a", "job.b"))
    assert(snap.find(_.context == "job").get.value == 3)
  }

  test("MetricStore: atomic per-run record, duplicate runId refused, fixed-schema table") {
    val dir = tmpDir("mstore")
    val store = new MetricStore(spark, dir)
    // empty store is still column-addressable
    assert(store.table.filter("metric = 'records.read'").count() == 0)
    store.record("jobA", "run-1", 1000L, Seq(
      MetricRecord("jobA.source", "records.read", "counter", 42),
      MetricRecord("jobA.branch.b", "bytes.written", "counter", 1024)))
    intercept[Exception] {
      store.record("jobA", "run-1", 2000L,
        Seq(MetricRecord("x", "y", "counter", 1)))
    }
    // a no-metric run still claims its runId but adds no rows (and no
    // all-null blank-line artifact)
    store.record("jobA", "run-empty", 3000L, Nil)
    intercept[Exception] {
      store.record("jobA", "run-empty", 4000L, Nil)
    }
    val t = store.table
    assert(t.count() == 2)
    assert(t.filter("job IS NULL").count() == 0)
    val row = t.filter("metric = 'records.read'").collect().head
    assert(row.getAs[String]("context") == "jobA.source")
    assert(row.getAs[Long]("value") == 42)
    assert(row.getAs[Long]("recorded_at_ms") == 1000L)
  }

  test("timeSeries orders one metric across runs") {
    val store = new MetricStore(spark, tmpDir("mstore-ts"))
    store.record("j", "r1", 1000L,
      Seq(MetricRecord("j.source", "records.read", "counter", 10)))
    store.record("j", "r2", 2000L,
      Seq(MetricRecord("j.source", "records.read", "counter", 25),
        MetricRecord("j.source", "records.rejected", "counter", 1)))
    val ts = store.timeSeries("j", "j.source", "records.read").collect()
    assert(ts.map(r => (r.getAs[String]("run_id"), r.getAs[Long]("value")))
      .toSeq == Seq(("r1", 10L), ("r2", 25L)))
  }

  test("pipeline run emits queryable per-stage records/bytes/timings") {
    import graft.pipeline.{PipelineRunner, PipelineSpec}
    val dir = tmpDir("metrics-e2e")
    spark.range(100).selectExpr("id", "id % 10 AS k")
      .write.parquet(s"$dir/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "mjob",
      "source.format" -> "parquet",
      "source.path" -> s"$dir/in",
      "rowpolicy.1.name" -> "small",
      "rowpolicy.1.predicate" -> "id < 90",
      "rowpolicy.1.type" -> "ERR_FILE",
      "qualitychecker.err.dir" -> s"$dir/err",
      "fork.1.name" -> "evens",
      "fork.1.filter" -> "k % 2 = 0",
      "fork.1.out" -> s"$dir/out/evens",
      "fork.2.name" -> "odds",
      "fork.2.filter" -> "k % 2 = 1",
      "fork.2.out" -> s"$dir/out/odds",
      "state.dir" -> s"$dir/state"))
    val r = PipelineRunner.run(spark, spec, "mrun-1")
    assert(r.stageMetrics.nonEmpty)

    val t = new MetricStore(spark, s"$dir/state/metrics").table
    def v(ctx: String, m: String): Long =
      t.filter(s"context = '$ctx' AND metric = '$m'")
        .collect().head.getAs[Long]("value")
    assert(v("mjob.source", "records.read") == 100)
    assert(v("mjob.source", "records.passed") == 90)
    assert(v("mjob.source", "records.rejected") == 10)
    assert(v("mjob.branch.evens", "records.written") == 45)
    assert(v("mjob.branch.odds", "records.written") == 45)
    // branch counters rolled up to the job root context
    assert(v("mjob", "records.written") == 90)
    assert(v("mjob.branch.evens", "bytes.written") > 0)
    // phase timers recorded (count row present and positive total)
    assert(v("mjob", "time.branch_write.count") == 1)
    assert(v("mjob", "time.branch_write.total_nanos") > 0)
  }

  test("counter update throughput scales with depth like the reference's numbers") {
    // BASELINE.md's only non-sink figures: the reference's metric tree
    // sustains 76M counter updates/s at root and 24M/s at depth 3
    // (single thread, Gobblin-Metrics-Performance.md:29-37). The
    // propagation design here is the same O(depth) ancestor walk over
    // LongAdders, so the shape must hold: depth-3 updates cost more
    // than root updates but stay within the same order of magnitude.
    // Floors are ~20x under the reference's figures — this is a
    // regression tripwire for an accidental O(tree) or lock-bound
    // implementation, not a hardware race.
    def qps(ctx: MetricContext, n: Int): Double = {
      val c = ctx.counter("hot")
      var i = 0
      val t0 = System.nanoTime()
      while (i < n) { c.inc(); i += 1 }
      n * 1e9 / (System.nanoTime() - t0)
    }
    val root = MetricContext.root("perf")
    val d3 = root.childContext("a").childContext("b").childContext("c")
    qps(root, 2000000); qps(d3, 2000000) // JIT warm-up
    val rootQps = qps(root, 8000000)
    val d3Qps = qps(d3, 8000000)
    info(f"root ${rootQps / 1e6}%.0f M/s, depth-3 ${d3Qps / 1e6}%.0f M/s " +
      "(reference: 76 / 24)")
    assert(rootQps > 4e6, f"root counter throughput collapsed: $rootQps%.0f/s")
    assert(d3Qps > 1e6, f"depth-3 counter throughput collapsed: $d3Qps%.0f/s")
    assert(d3Qps > rootQps / 30,
      "depth scaling should be O(depth), not orders-of-magnitude worse")
  }
}
