package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.metrics.{MetricContext, MetricStore, TrackingEvent}

/** Streaming metric emission — the per-epoch half of the metrics
  * subsystem. The reference reports task-level metrics continuously
  * while streaming jobs run (gobblin-metrics contexts feed its
  * scheduled reporters; KafkaExtractor etc. update records-read
  * meters per poll); Structured Streaming's native signal is the
  * per-batch `StreamingQueryProgress`, so this listener folds each
  * finished micro-batch into a [[MetricContext]]:
  *
  *   <root>.stream.<queryName>   records.in   += numInputRows
  *                               records.out  += sink numOutputRows (when reported)
  *                               epochs       += 1
  *                               time.batch    : timer(triggerExecution ms)
  *                               gauge input.rows_per_sec (last batch)
  *
  * and optionally lands one [[MetricStore]] record-set per batch — a
  * time series of the query's RUNNING TOTALS, one point per epoch
  * (run id = "<queryName>-epoch-<batchId>", so replays of the same
  * epoch after a restart are refused by the store's uniqueness check
  * instead of double-counting — the same idempotency the exactly-once
  * sink ledger gives data). Counter rollup to the root context means a
  * job-wide dashboard sees batch + streaming totals in one place.
  * Everything here is driver-side listener state: O(queries × metrics),
  * no executor involvement.
  */
final class StreamMetricsListener(ctx: MetricContext,
                                  store: Option[MetricStore] = None)
    extends StreamingQueryListener {

  private val streamRoot = ctx.childContext("stream")
  // queryName -> context; queries can restart with new run ids
  private val perQuery = new ConcurrentHashMap[String, MetricContext]()

  private def qctx(name: String): MetricContext =
    perQuery.computeIfAbsent(name, n => streamRoot.childContext(n))

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    ctx.submitEvent(TrackingEvent("graft.stream", "QueryStarted",
      System.currentTimeMillis(),
      Map("query" -> Option(e.name).getOrElse(e.id.toString))))

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val c = qctx(name)
    c.counter("records.in").inc(p.numInputRows)
    Option(p.sink).foreach { s =>
      if (s.numOutputRows >= 0) c.counter("records.out").inc(s.numOutputRows)
    }
    c.counter("epochs").inc()
    val durMs = Option(p.durationMs.get("triggerExecution"))
      .fold(0L)(_.longValue())
    c.timer("time.batch").update(durMs * 1000000L)
    // first batches report NaN/Infinity rates — a gauge of garbage is
    // worse than a zero
    val rate = p.inputRowsPerSecond
    c.gauge("input.rows_per_sec",
      if (rate.isNaN || rate.isInfinite) 0L else math.round(rate).max(0))
    store.foreach { st =>
      try st.record(name, s"$name-epoch-${p.batchId}",
        System.currentTimeMillis(), c.snapshot())
      catch { case _: java.io.IOException => } // replayed epoch: already recorded
    }
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    ctx.submitEvent(TrackingEvent("graft.stream", "QueryTerminated",
      System.currentTimeMillis(),
      Map("id" -> e.id.toString,
        "exception" -> e.exception.getOrElse(""))))
}

object StreamMetrics {
  /** Attach a listener to the session; returns it for later removal
    * via `spark.streams.removeListener`. */
  def attach(spark: SparkSession, ctx: MetricContext,
             store: Option[MetricStore] = None): StreamMetricsListener = {
    val l = new StreamMetricsListener(ctx, store)
    spark.streams.addListener(l)
    l
  }
}
