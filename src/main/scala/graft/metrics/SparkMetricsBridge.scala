package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.util.LongAccumulator

/** The Spark-runtime face of [[MetricContext]] — the analogue of the
  * reference's Hadoop-counters reporter (gobblin-modules/
  * gobblin-metrics-hadoop/.../NewAPIHadoopCounterReporter.java:39,
  * which writes the metric tree into the execution engine's own
  * counter surface so job metrics show up where the cluster's tooling
  * already looks). Three public seams, composable and independent:
  *
  *  1. [[AccumulatorReporter]] — mirrors every metric into a NAMED
  *     [[LongAccumulator]] registered on the SparkContext: Spark's
  *     native counter surface (queryable as `acc.value`, serialized
  *     into the event log, shown by the UI wherever the accumulator
  *     participates in a stage).
  *  2. [[CodahaleMirror]] + [[GraftSparkPlugin]] — mirrors the tree
  *     into a Codahale `MetricRegistry`; as a `spark.plugins` entry the
  *     registry is the driver-plugin registry, so graft metrics flow
  *     through Spark's OWN MetricsSystem and out every sink the cluster
  *     configured (JMX, Prometheus servlet, Graphite, the UI's
  *     /metrics/json endpoint) with zero extra wiring.
  *  3. [[TaskMetricsRecorder]] — the reverse direction: a
  *     SparkListener folding each completed stage's task metrics
  *     (records/bytes read, shuffle read/write, executor time) into a
  *     per-job child context, so SPARK execution metrics reach graft's
  *     reporters/stores next to the engine's semantic counters.
  *
  * All three are driver-side and O(metrics) per report/stage — they
  * never touch record data, so cost is independent of job scale.
  */
object SparkMetricsBridge {

  /** Contexts [[GraftSparkPlugin]] mirrors. Register a root context
    * once per job; deregister when the job's metrics should stop
    * being exported (names persist in the registry with their last
    * value until then). */
  private val contexts = new java.util.concurrent.CopyOnWriteArrayList[MetricContext]()

  def register(ctx: MetricContext): Unit = { contexts.addIfAbsent(ctx): Unit }
  def deregister(ctx: MetricContext): Unit = { contexts.remove(ctx): Unit }
  private[metrics] def registered: Seq[MetricContext] =
    contexts.asScala.toSeq
}

/** Mirrors metric records into NAMED LongAccumulators — one per
  * `<prefix>.<context>.<metric>` — adding the delta since the last
  * report so each accumulator's `value` tracks the metric exactly
  * (gauges may move down; a negative delta is a legal accumulator
  * add). Accumulator registration is idempotent per name and lazy, so
  * the accumulator set grows with the metric tree. */
final class AccumulatorReporter(sc: SparkContext, prefix: String = "graft")
    extends MetricReporter {
  private val accs = new ConcurrentHashMap[String, LongAccumulator]()
  private val last = new ConcurrentHashMap[String, Long]()

  override def report(records: Seq[MetricRecord], timestampSec: Long): Unit =
    records.foreach { r =>
      val name = Seq(prefix, r.context, r.metric).filter(_.nonEmpty)
        .mkString(".")
      val acc = accs.computeIfAbsent(name, n => sc.longAccumulator(n))
      val prev = last.getOrDefault(name, 0L)
      if (r.value != prev) {
        acc.add(r.value - prev)
        last.put(name, r.value): Unit
      }
    }

  /** The live accumulator for a mirrored metric name, if reported. */
  def accumulator(name: String): Option[LongAccumulator] =
    Option(accs.get(name))
}

/** Mirrors metric records into a Codahale [[MetricRegistry]] as
  * settable gauges — the registry Spark's MetricsSystem polls. New
  * metric names gain a gauge on the report that first carries them. */
final class CodahaleMirror(registry: MetricRegistry,
                           prefix: String = "graft")
    extends MetricReporter {
  private val values = new ConcurrentHashMap[String, java.lang.Long]()

  override def report(records: Seq[MetricRecord], timestampSec: Long): Unit =
    records.foreach { r =>
      val name = Seq(prefix, r.context, r.metric).filter(_.nonEmpty)
        .mkString(".")
      if (!values.containsKey(name)) {
        values.put(name, r.value): Unit
        // gauge reads the mirror map, so later reports need no
        // registry mutation (registry.gauge is idempotent per name)
        registry.gauge(name, () => new Gauge[java.lang.Long] {
          override def getValue: java.lang.Long = values.get(name)
        }): Unit
      } else values.put(name, r.value): Unit
    }
}

/** `spark.plugins=graft.metrics.GraftSparkPlugin`: every context
  * passed to [[SparkMetricsBridge.register]] is pumped into the
  * driver-plugin metric registry each period, surfacing the graft
  * metric tree through Spark's MetricsSystem under the
  * `plugin.graft.metrics.GraftSparkPlugin` namespace. */
final class GraftSparkPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new GraftDriverPlugin
  override def executorPlugin(): ExecutorPlugin = null
}

final class GraftDriverPlugin extends DriverPlugin {
  private var pump: Option[java.util.concurrent.ScheduledExecutorService] = None
  private var mirror: Option[CodahaleMirror] = None

  override def registerMetrics(appId: String, ctx: PluginContext): Unit = {
    val m = new CodahaleMirror(ctx.metricRegistry())
    mirror = Some(m)
    val exec = java.util.concurrent.Executors
      .newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-spark-plugin-metrics")
        t.setDaemon(true); t
      }
    exec.scheduleAtFixedRate(() => pumpOnce(),
      1, 10, java.util.concurrent.TimeUnit.SECONDS): Unit
    pump = Some(exec)
  }

  /** One synchronous mirror pass over every registered context (the
    * schedule's body; also the test seam and the shutdown flush). */
  def pumpOnce(): Unit =
    mirror.foreach { m =>
      SparkMetricsBridge.registered.foreach { c =>
        try m.report(c.snapshotRecursive(),
          System.currentTimeMillis() / 1000L)
        catch { case e: Exception =>
          System.err.println(s"[graft] plugin metric pump failed: $e") }
      }
    }

  override def shutdown(): Unit = {
    pumpOnce() // final snapshot so short jobs still export
    pump.foreach(_.shutdownNow()): Unit
  }
}

/** Folds completed stages' task metrics into `root` — a child context
  * per Spark job (`spark_job_<id>`), so per-job counters bubble to the
  * root (ContextAwareCounter semantics) and land in every attached
  * reporter/store beside the engine's semantic metrics. */
final class TaskMetricsRecorder(root: MetricContext) extends SparkListener {
  // stageId -> jobId; boxed values so a missing stage maps to null ->
  // None (an Int-valued map would unbox null to 0 and attribute unknown
  // stages to a phantom job 0). Entries for stages that never complete
  // (SKIPPED via shuffle/cache reuse) are purged at job end, so the map
  // stays bounded on long-running drivers.
  private val stageJob = new ConcurrentHashMap[Int, java.lang.Integer]()

  override def onJobStart(js: SparkListenerJobStart): Unit =
    js.stageIds.foreach(sid =>
      stageJob.put(sid, java.lang.Integer.valueOf(js.jobId)): Unit)

  override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
    stageJob.entrySet.removeIf(e => e.getValue.intValue() == je.jobId): Unit

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    val jobId = Option(stageJob.remove(info.stageId)).map(_.intValue())
    val ctx = jobId.fold(root)(j => root.childContext(s"spark_job_$j"))
    val m = info.taskMetrics
    if (m != null) {
      ctx.counter("spark.records_read").inc(m.inputMetrics.recordsRead)
      ctx.counter("spark.bytes_read").inc(m.inputMetrics.bytesRead)
      ctx.counter("spark.records_written").inc(m.outputMetrics.recordsWritten)
      ctx.counter("spark.bytes_written").inc(m.outputMetrics.bytesWritten)
      ctx.counter("spark.shuffle_read_bytes")
        .inc(m.shuffleReadMetrics.totalBytesRead)
      ctx.counter("spark.shuffle_write_bytes")
        .inc(m.shuffleWriteMetrics.bytesWritten)
      ctx.counter("spark.executor_run_ms").inc(m.executorRunTime)
      ctx.counter("spark.executor_cpu_ms").inc(m.executorCpuTime / 1000000L)
      ctx.counter("spark.spill_disk_bytes").inc(m.diskBytesSpilled)
      ctx.counter("spark.stages_completed").inc()
    }
  }
}
