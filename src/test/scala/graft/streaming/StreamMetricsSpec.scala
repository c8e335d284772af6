package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.metrics.{MetricContext, MetricStore, TrackingEvent}

class StreamMetricsSpec extends SparkSpec {

  test("micro-batch progress folds into the context tree and metric store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ctx = MetricContext.root("sjob")
    val events = scala.collection.mutable.ListBuffer.empty[TrackingEvent]
    ctx.addEventListener(e => events.synchronized { events += e }: Unit)
    val store = new MetricStore(spark, tmpDir("stream-metrics"))
    val listener = StreamMetrics.attach(spark, ctx, Some(store))
    try {
      val src = MemoryStream[(Timestamp, String)]
      val q = src.toDF().toDF("ts", "v")
        .writeStream.format("memory")
        .queryName("sm_q").outputMode("append").start()
      src.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), "b"))
      q.processAllAvailable()
      src.addData((Timestamp.valueOf("2024-01-01 10:02:00"), "c"))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()

      val qc = ctx.childContext("stream").childContext("sm_q")
      assert(qc.counterValue("records.in") == 3)
      assert(qc.counterValue("epochs") >= 2)
      // rollup: the job root sees stream totals too
      assert(ctx.counterValue("records.in") == 3)
      assert(qc.timerSnapshot("time.batch").exists(_.count >= 2))

      // the store has one record-set per epoch, keyed for idempotency.
      // The listener callback incs counters BEFORE its store write, so
      // the counter asserts above can pass while epoch 2's file create
      // is still in flight — poll (bounded) instead of racing it.
      def storeRows() = store.table.filter("job = 'sm_q'")
        .filter("metric = 'records.in'").count()
      val deadline = System.currentTimeMillis() + 10000
      while (storeRows() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val t = store.table.filter("job = 'sm_q'")
      assert(t.filter("metric = 'records.in'").count() >= 2)
      val runIds = t.select("run_id").distinct().collect()
        .map(_.getString(0)).toSeq
      assert(runIds.forall(_.startsWith("sm_q-epoch-")))

      // lifecycle tracking events bubbled to the root
      val names = events.synchronized(events.map(_.name).toSet)
      assert(names.contains("QueryStarted"))
      assert(names.contains("QueryTerminated"))
    } finally spark.streams.removeListener(listener)
  }
}
