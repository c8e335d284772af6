package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.SparkException
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.sinks.RecordSinks._

/** Shared in-JVM probe for local-mode sink tests. */
object SinkProbe {
  val written = ConcurrentHashMap.newKeySet[Long]()
  val attempts = new ConcurrentHashMap[Long, AtomicInteger]()
  val batches = ConcurrentHashMap.newKeySet[Int]()
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  def reset(): Unit = {
    written.clear(); attempts.clear(); batches.clear()
    inFlight.set(0); maxInFlight.set(0)
  }
  def attempt(id: Long): Int =
    attempts.computeIfAbsent(id, _ => new AtomicInteger(0)).incrementAndGet()
}

class RecordSinksSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  test("retry decorator: flaky sink succeeds on the 3rd attempt per record") {
    SinkProbe.reset()
    val flaky = new RecordSink[Row] {
      def write(r: Row): Unit = {
        val id = r.getLong(0)
        if (SinkProbe.attempt(id) < 3) throw new RuntimeException(s"flake $id")
        SinkProbe.written.add(id): Unit
      }
    }
    RecordSinks.run(ids(20), () => flaky,
      retry = Some(RetryConfig(maxAttempts = 5, initialBackoffMs = 1)))
    assert(SinkProbe.written.size == 20)
    assert(SinkProbe.attempts.values().stream().allMatch(_.get == 3))
  }

  test("retry decorator: exhausted attempts fail the job") {
    SinkProbe.reset()
    val dead = new RecordSink[Row] {
      def write(r: Row): Unit = throw new RuntimeException("always down")
    }
    intercept[SparkException] {
      RecordSinks.run(ids(2).coalesce(1), () => dead,
        retry = Some(RetryConfig(maxAttempts = 2, initialBackoffMs = 1)))
    }
  }

  test("throttle decorator: rate cap stretches wall time") {
    SinkProbe.reset()
    val sink = new RecordSink[Row] {
      def write(r: Row): Unit = { SinkProbe.written.add(r.getLong(0)): Unit }
    }
    val t0 = System.nanoTime()
    // 1 partition, 12 records at 100 rec/s, burst 1 -> >= ~110 ms
    RecordSinks.run(ids(12).coalesce(1), () => sink,
      throttle = Some(ThrottleConfig(recordsPerSecond = 100.0)))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(SinkProbe.written.size == 12)
    assert(elapsedMs >= 100, s"throttle too fast: $elapsedMs ms")
  }

  test("async batch sink: batch shape, bounded in-flight, failure-ratio gate") {
    SinkProbe.reset()
    val batcher = new BatchSink[Row] {
      def writeBatch(b: Seq[Row]): Unit = {
        val cur = SinkProbe.inFlight.incrementAndGet()
        SinkProbe.maxInFlight.getAndUpdate(m => math.max(m, cur)): Unit
        try {
          Thread.sleep(20)
          assert(b.size <= 10)
          SinkProbe.batches.add(b.hashCode()): Unit
          b.foreach(r => SinkProbe.written.add(r.getLong(0)))
        } finally SinkProbe.inFlight.decrementAndGet(): Unit
      }
    }
    RecordSinks.runAsyncBatched(ids(100).coalesce(1), () => batcher,
      AsyncConfig(batchSize = 10, maxInFlight = 2))
    assert(SinkProbe.written.size == 100)
    assert(SinkProbe.batches.size == 10)
    assert(SinkProbe.maxInFlight.get <= 2)

    // every batch fails -> ratio 1.0 > 0.0 gate -> task fails
    val alwaysFail = new BatchSink[Row] {
      def writeBatch(b: Seq[Row]): Unit = throw new RuntimeException("no")
    }
    intercept[SparkException] {
      RecordSinks.runAsyncBatched(ids(30).coalesce(1), () => alwaysFail,
        AsyncConfig(batchSize = 10, maxInFlight = 2, maxFailureRatio = 0.0))
    }
    // ...but a permissive ratio commits
    RecordSinks.runAsyncBatched(ids(30).coalesce(1), () => alwaysFail,
      AsyncConfig(batchSize = 10, maxInFlight = 2, maxFailureRatio = 1.0))
  }
}
