package graft.sinks

import java.util.concurrent.{Executors, Semaphore, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** Record-at-a-time sink adapters for external services (HTTP, ES,
  * object stores, message buses) driven from `foreachPartition`, with the
  * reference's writer decorators:
  *
  *  - retry with exponential backoff — RetryWriter
  *    (gobblin-core/.../writer/RetryWriter.java:51);
  *  - token-bucket rate limiting — ThrottleWriter
  *    (gobblin-core/.../writer/ThrottleWriter.java:44);
  *  - bounded-in-flight async batching with a failure-ratio commit gate —
  *    AsyncWriterManager (gobblin-core-base/.../writer/
  *    AsyncWriterManager.java:72).
  *
  * Scale: every decorator is per-partition state (one sink instance, one
  * token bucket, one in-flight pool per partition — the reference is
  * likewise per-task), so global throughput = partitions x per-sink rate;
  * Spark's own task retry handles whole-partition failures while these
  * handle per-record/service-level flakiness.
  */
object RecordSinks {

  /** One instance per partition; `open` before the first record. */
  trait RecordSink[T] extends Serializable {
    def open(partitionId: Int): Unit = {}
    def write(record: T): Unit
    def close(): Unit = {}
  }

  final case class RetryConfig(maxAttempts: Int = 3,
                               initialBackoffMs: Long = 100,
                               multiplier: Double = 2.0)

  final case class ThrottleConfig(recordsPerSecond: Double,
                                  burst: Int = 1)

  /** Per-record retry with exponential backoff; after maxAttempts the
    * exception propagates (task-level failure -> Spark task retry). */
  def withRetry[T](sink: RecordSink[T], cfg: RetryConfig,
                   retries: Option[LongAccumulator] = None): RecordSink[T] =
    new RecordSink[T] {
      override def open(pid: Int): Unit = sink.open(pid)
      override def close(): Unit = sink.close()
      def write(record: T): Unit = {
        var attempt = 0
        var backoff = cfg.initialBackoffMs
        var done = false
        while (!done) {
          attempt += 1
          try { sink.write(record); done = true }
          catch {
            case e: Exception if attempt < cfg.maxAttempts =>
              retries.foreach(_.add(1))
              Thread.sleep(backoff)
              backoff = (backoff * cfg.multiplier).toLong.max(1L)
          }
        }
      }
    }

  /** Token-bucket throttle: refills continuously at recordsPerSecond up
    * to `burst`; a write with no token sleeps until one accrues. */
  def withThrottle[T](sink: RecordSink[T], cfg: ThrottleConfig): RecordSink[T] =
    new RecordSink[T] {
      private var tokens: Double = cfg.burst.toDouble
      private var lastNs: Long = System.nanoTime()
      override def open(pid: Int): Unit = { lastNs = System.nanoTime(); sink.open(pid) }
      override def close(): Unit = sink.close()
      def write(record: T): Unit = {
        var now = System.nanoTime()
        tokens = math.min(cfg.burst.toDouble,
          tokens + (now - lastNs) / 1e9 * cfg.recordsPerSecond)
        lastNs = now
        while (tokens < 1.0) {
          val needMs = ((1.0 - tokens) / cfg.recordsPerSecond * 1000).toLong.max(1L)
          Thread.sleep(needMs)
          now = System.nanoTime()
          tokens = math.min(cfg.burst.toDouble,
            tokens + (now - lastNs) / 1e9 * cfg.recordsPerSecond)
          lastNs = now
        }
        tokens -= 1.0
        sink.write(record)
      }
    }

  /** Console writer (gobblin-core/.../writer/ConsoleWriter.java:29): the
    * debugging sink — rows to stdout, bounded. */
  def console(df: DataFrame, numRows: Int = 20, truncate: Boolean = true): Unit =
    df.show(numRows, truncate)

  /** Drive a decorated sink over every partition of df. */
  def run(df: DataFrame, mkSink: () => RecordSink[Row],
          retry: Option[RetryConfig] = None,
          throttle: Option[ThrottleConfig] = None): Unit = {
    val retriesAcc = retry.map(_ =>
      df.sparkSession.sparkContext.longAccumulator("graft.sink.retries"))
    df.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var s = mkSink()
      retry.foreach(c => s = withRetry(s, c, retriesAcc))
      throttle.foreach(c => s = withThrottle(s, c))
      s.open(pid)
      try { it.foreach(s.write); s.close() }
      catch { case e: Throwable => try s.close() catch { case _: Exception => }; throw e }
    }
  }

  // ---- bounded async batching (AsyncWriterManager semantics) -------------

  /** Async batch sink: receives whole batches, returns when the batch is
    * durably accepted (or throws). */
  trait BatchSink[T] extends Serializable {
    def writeBatch(batch: Seq[T]): Unit
    def close(): Unit = {}
  }

  final case class AsyncConfig(batchSize: Int = 100,
                               maxInFlight: Int = 4,
                               maxFailureRatio: Double = 0.0)

  /** Per partition: accumulate batches, keep at most maxInFlight batch
    * writes running on a private pool, and at the end fail the task if
    * failed-batches / total-batches exceeds maxFailureRatio (the
    * reference's failure-ratio commit policy). */
  def runAsyncBatched[T](df: DataFrame, mkSink: () => BatchSink[Row],
                         cfg: AsyncConfig): Unit = {
    require(cfg.batchSize > 0 && cfg.maxInFlight > 0)
    df.rdd.foreachPartition { it =>
      val sink = mkSink()
      val pool = Executors.newFixedThreadPool(cfg.maxInFlight)
      val permits = new Semaphore(cfg.maxInFlight)
      val failures = new AtomicLong(0)
      var batches = 0L
      try {
        it.grouped(cfg.batchSize).foreach { batch =>
          val b = batch.toVector
          batches += 1
          permits.acquire() // bounded in-flight: blocks when pool is busy
          pool.execute(() =>
            try sink.writeBatch(b)
            catch { case _: Exception => failures.incrementAndGet(): Unit }
            finally permits.release())
        }
        pool.shutdown()
        require(pool.awaitTermination(1, TimeUnit.HOURS), "async sink drain timeout")
        val ratio = if (batches == 0) 0.0 else failures.get().toDouble / batches
        require(ratio <= cfg.maxFailureRatio,
          f"async sink failure ratio $ratio%.3f exceeds ${cfg.maxFailureRatio}%.3f")
        sink.close()
      } finally pool.shutdownNow()
    }
  }
}
