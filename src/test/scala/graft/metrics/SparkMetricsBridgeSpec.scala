package graft.metrics

import com.codahale.metrics.MetricRegistry

import graft.SparkSpec

/** The Spark-runtime metric face (the Hadoop-counters-reporter
  * analogue): accumulator mirror, Codahale/plugin mirror, and the
  * task-metrics listener — all driven against the shared session. */
class SparkMetricsBridgeSpec extends SparkSpec {

  test("AccumulatorReporter mirrors counters into named accumulators, tracking deltas") {
    val ctx = MetricContext.root("accjob")
    val rep = new AccumulatorReporter(spark.sparkContext, prefix = "g")
    ctx.counter("rows").inc(5)
    ctx.gauge("lag", 100)
    rep.report(ctx.snapshotRecursive(), 0L)
    assert(rep.accumulator("g.accjob.rows").map(_.value) == Some(5L))
    assert(rep.accumulator("g.accjob.lag").map(_.value) == Some(100L))
    // counter moves up, gauge moves DOWN — both track exactly
    ctx.counter("rows").inc(7)
    ctx.gauge("lag", 40)
    rep.report(ctx.snapshotRecursive(), 1L)
    assert(rep.accumulator("g.accjob.rows").map(_.value) == Some(12L))
    assert(rep.accumulator("g.accjob.lag").map(_.value) == Some(40L))
    // accumulators are REGISTERED on the context (named), not ad-hoc
    assert(rep.accumulator("g.accjob.rows").exists(_.name.contains("g.accjob.rows")))
  }

  test("CodahaleMirror exposes the tree as live gauges; new metrics appear on later reports") {
    val ctx = MetricContext.root("cjob")
    val registry = new MetricRegistry
    val m = new CodahaleMirror(registry, prefix = "g")
    ctx.counter("extracted").inc(3)
    m.report(ctx.snapshotRecursive(), 0L)
    def gauge(n: String): Long =
      registry.getGauges.get(n).getValue.asInstanceOf[java.lang.Long].longValue()
    assert(gauge("g.cjob.extracted") == 3L)
    // value updates flow through the SAME gauge object
    ctx.counter("extracted").inc(4)
    val child = ctx.childContext("task1")
    child.counter("written").inc(9)
    m.report(ctx.snapshotRecursive(), 1L)
    assert(gauge("g.cjob.extracted") == 7L)
    assert(gauge("g.cjob.task1.written") == 9L)
    // the child's counter bubbled to the root row too
    assert(gauge("g.cjob.written") == 9L)
  }

  test("GraftSparkPlugin pumps registered contexts into the plugin registry") {
    val registry = new MetricRegistry
    val plugin = new GraftSparkPlugin().driverPlugin()
      .asInstanceOf[GraftDriverPlugin]
    // a minimal PluginContext: the plugin only touches metricRegistry()
    plugin.registerMetrics("app-1", new org.apache.spark.api.plugin.PluginContext {
      override def metricRegistry(): MetricRegistry = registry
      override def conf() = spark.sparkContext.getConf
      override def executorID(): String = "driver"
      override def hostname(): String = "localhost"
      override def resources() = new java.util.HashMap()
      override def send(message: Any): Unit = ()
      override def ask(message: Any): AnyRef =
        throw new UnsupportedOperationException
    })
    val ctx = MetricContext.root("pluginjob")
    SparkMetricsBridge.register(ctx)
    try {
      ctx.counter("published").inc(42)
      plugin.pumpOnce()
      val g = registry.getGauges.get("graft.pluginjob.published")
      assert(g != null, registry.getGauges.keySet())
      assert(g.getValue.asInstanceOf[java.lang.Long].longValue() == 42L)
      // shutdown flushes a final snapshot
      ctx.counter("published").inc(1)
      plugin.shutdown()
      assert(registry.getGauges.get("graft.pluginjob.published")
        .getValue.asInstanceOf[java.lang.Long].longValue() == 43L)
    } finally SparkMetricsBridge.deregister(ctx)
  }

  test("TaskMetricsRecorder folds stage task metrics into per-job child contexts") {
    val root = MetricContext.root("lsnrjob")
    val recorder = new TaskMetricsRecorder(root)
    spark.sparkContext.addSparkListener(recorder)
    try {
      // a real distributed action with a shuffle: input + shuffle metrics
      val n = graft.Tables.load(spark, sf, "orders")
        .groupBy("o_orderstatus").count().count()
      assert(n > 0)
      // the listener bus is async — poll until the stages landed
      val deadline = System.currentTimeMillis() + 30000
      while (root.counterValue("spark.stages_completed") < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(root.counterValue("spark.stages_completed") >= 2,
        "expected at least a map and a reduce stage")
      assert(root.counterValue("spark.records_read") > 0)
      assert(root.counterValue("spark.shuffle_write_bytes") > 0)
      assert(root.counterValue("spark.shuffle_read_bytes") > 0)
      assert(root.counterValue("spark.executor_run_ms") > 0)
      // per-job attribution: some child context carries the counters
      val perJob = root.snapshotRecursive().filter(r =>
        r.context.contains("spark_job_") && r.metric == "spark.records_read")
      assert(perJob.map(_.value).sum == root.counterValue("spark.records_read"),
        perJob.toString)
    } finally spark.sparkContext.removeSparkListener(recorder)
  }
}
