package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}
import java.util.concurrent.CopyOnWriteArrayList

import scala.jdk.CollectionConverters._

/** Hierarchical metric contexts — the reference's gobblin-metrics core
  * (gobblin-metrics-libs/gobblin-metrics-base/.../MetricContext.java:85,109:
  * a named tree of registries carrying tags;
  * ContextAwareCounter.java:43: a metric update at a child context also
  * updates the same-named metric in every ancestor, so a root-level
  * reporter sees job-wide totals while leaf contexts keep per-task
  * detail; MetricContext.java:208 submitEvent: tracking events bubble to
  * ancestors and are delivered to listeners wherever attached).
  *
  * This is deliberately DRIVER-SIDE bookkeeping: executors never touch a
  * MetricContext. Distributed per-stage counts come from `observe()`
  * nodes evaluated inside the sink actions (see
  * [[graft.pipeline.PipelineRunner]]) and are *recorded into* a context —
  * the context tree is the aggregation/naming/reporting surface, not a
  * shuffle participant, so its cost is O(metrics), independent of data
  * scale. Counters/timers use LongAdder/CAS so concurrent branch actions
  * can update them; propagation cost is O(depth), matching the
  * reference's published depth-scaling numbers (BASELINE.md).
  */
final class MetricContext private (
    val name: String,
    val parent: Option[MetricContext],
    val tags: Map[String, String]) {

  /** Dotted path from the root context, e.g. "job.task3.fork0". */
  val fullName: String =
    parent.fold(name)(p => s"${p.fullName}.$name")

  // metric maps are per-context; a child's update touches its own entry
  // plus one entry per ancestor (ContextAwareCounter semantics)
  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val gauges = new ConcurrentHashMap[String, AtomicLong]()
  private val timerCounts = new ConcurrentHashMap[String, LongAdder]()
  private val timerNanos = new ConcurrentHashMap[String, LongAdder]()
  private val timerMaxNanos = new ConcurrentHashMap[String, AtomicLong]()
  private val children = new ConcurrentHashMap[String, MetricContext]()
  private val eventListeners =
    new CopyOnWriteArrayList[TrackingEvent => Unit]()

  def childContext(childName: String,
                   childTags: Map[String, String] = Map.empty): MetricContext =
    children.computeIfAbsent(childName,
      n => new MetricContext(n, Some(this), tags ++ childTags))

  /** Context-aware counter: inc here increments every ancestor too. */
  def counter(metric: String): Counter = new Counter(this, metric)

  /** Context-aware timer (count + total + max, in nanos). */
  def timer(metric: String): Timer = new Timer(this, metric)

  /** Point-in-time gauge (last-write-wins, no propagation — a gauge is a
    * level, not a flow; summing levels across contexts is meaningless). */
  def gauge(metric: String, value: Long): Unit =
    gauges.computeIfAbsent(metric, _ => new AtomicLong()).set(value)

  private[metrics] def addToCounter(metric: String, n: Long): Unit = {
    counters.computeIfAbsent(metric, _ => new LongAdder()).add(n)
    parent.foreach(_.addToCounter(metric, n))
  }

  private[metrics] def recordTimer(metric: String, nanos: Long): Unit = {
    timerCounts.computeIfAbsent(metric, _ => new LongAdder()).increment()
    timerNanos.computeIfAbsent(metric, _ => new LongAdder()).add(nanos)
    timerMaxNanos.computeIfAbsent(metric, _ => new AtomicLong())
      .accumulateAndGet(nanos, math.max)
    parent.foreach(_.recordTimer(metric, nanos))
  }

  /** Attach an event listener (the reference attaches reporters to a
    * context; they receive events submitted at or below it). */
  def addEventListener(f: TrackingEvent => Unit): Unit =
    eventListeners.add(f)

  /** Submit a tracking event: delivered to listeners on this context and
    * every ancestor (GobblinTrackingEvent via MetricContext.submitEvent). */
  def submitEvent(e: TrackingEvent): Unit = {
    eventListeners.forEach(f => f(e))
    parent.foreach(_.submitEvent(e))
  }

  def counterValue(metric: String): Long =
    Option(counters.get(metric)).fold(0L)(_.sum())

  def gaugeValue(metric: String): Option[Long] =
    Option(gauges.get(metric)).map(_.get())

  def timerSnapshot(metric: String): Option[TimerSnapshot] =
    Option(timerCounts.get(metric)).map { c =>
      TimerSnapshot(c.sum(), timerNanos.get(metric).sum(),
        timerMaxNanos.get(metric).get())
    }

  /** Every metric in THIS context as flat records (metric, kind, value) —
    * the reporting surface. Timers emit count/total_nanos/max_nanos rows. */
  def snapshot(): Seq[MetricRecord] = {
    val cs = counters.asScala.toSeq.map { case (m, v) =>
      MetricRecord(fullName, m, "counter", v.sum()) }
    val gs = gauges.asScala.toSeq.map { case (m, v) =>
      MetricRecord(fullName, m, "gauge", v.get()) }
    val ts = timerCounts.asScala.keys.toSeq.flatMap { m =>
      val s = timerSnapshot(m).get
      Seq(MetricRecord(fullName, s"$m.count", "timer", s.count),
        MetricRecord(fullName, s"$m.total_nanos", "timer", s.totalNanos),
        MetricRecord(fullName, s"$m.max_nanos", "timer", s.maxNanos))
    }
    (cs ++ gs ++ ts).sortBy(r => (r.context, r.metric))
  }

  /** This context's snapshot plus every descendant's. */
  def snapshotRecursive(): Seq[MetricRecord] =
    snapshot() ++ children.asScala.values.toSeq.sortBy(_.name)
      .flatMap(_.snapshotRecursive())
}

object MetricContext {
  def root(name: String, tags: Map[String, String] = Map.empty): MetricContext =
    new MetricContext(name, None, tags)
}

/** A context-aware counter handle (ContextAwareCounter.java:43). */
final class Counter private[metrics] (ctx: MetricContext, metric: String) {
  def inc(): Unit = inc(1L)
  def inc(n: Long): Unit = ctx.addToCounter(metric, n)
  def value: Long = ctx.counterValue(metric)
}

/** A context-aware timer handle. */
final class Timer private[metrics] (ctx: MetricContext, metric: String) {
  def update(nanos: Long): Unit = ctx.recordTimer(metric, nanos)
  def time[A](body: => A): A = {
    val t0 = System.nanoTime()
    try body finally ctx.recordTimer(metric, System.nanoTime() - t0)
  }
}

final case class TimerSnapshot(count: Long, totalNanos: Long, maxNanos: Long)

/** One reported metric value. */
final case class MetricRecord(context: String, metric: String,
                              kind: String, value: Long)

/** A tracking event (GobblinTrackingEvent: namespace + name + metadata;
  * timestamp supplied by the caller so event streams are replayable). */
final case class TrackingEvent(namespace: String, name: String,
                               timestampMs: Long,
                               metadata: Map[String, String] = Map.empty)
