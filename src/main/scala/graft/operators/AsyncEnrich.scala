package graft.operators

import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, Future}

import org.apache.spark.sql.{Dataset, Encoder}

/** Async 1:1 enrichment with bounded in-flight parallelism — the
  * reference's `AsyncConverter1to1`
  * (gobblin-core-base/.../converter/AsyncConverter1to1.java:49): each
  * record is converted by an async call (external-service enrichment —
  * geo lookup, entity resolution, feature service), with at most
  * `maxInFlight` outstanding calls and the ORIGINAL record order
  * preserved.
  *
  * Spark-first this is `mapPartitions`, not a Catalyst expression: the
  * work is per-record RPC, exactly the "genuine per-partition imperative
  * logic" carve-out. The bound is per PARTITION — cluster-wide in-flight
  * is maxInFlight x running tasks, which is the same knob the reference
  * exposes per task.
  */
object AsyncEnrich {

  /** Pull-based bounded pipeline over one partition's iterator: keep up
    * to `maxInFlight` futures in a FIFO window, await the head, refill
    * AFTER the await completes so outstanding calls (window + the one
    * being awaited) never exceed the bound. The window stays full behind
    * the head, so slow calls overlap instead of serializing. */
  def mapAsync[T, U](it: Iterator[T], maxInFlight: Int, timeout: Duration)
                    (f: T => Future[U]): Iterator[U] = {
    require(maxInFlight > 0, "maxInFlight must be positive")
    val window = mutable.Queue.empty[Future[U]]
    new Iterator[U] {
      private def fill(): Unit =
        while (window.size < maxInFlight && it.hasNext) window += f(it.next())
      fill()
      override def hasNext: Boolean = window.nonEmpty
      override def next(): U = {
        val r = Await.result(window.dequeue(), timeout)
        fill()
        r
      }
    }
  }

  /** Dataset face: async-enrich every record, order preserved within
    * each partition. `f` runs on executors — construct clients lazily in
    * a shared object, not in the closure. */
  def enrich[T, U: Encoder](ds: Dataset[T], maxInFlight: Int,
                            timeout: Duration = Duration.Inf)
                           (f: T => Future[U]): Dataset[U] =
    ds.mapPartitions(it => mapAsync(it, maxInFlight, timeout)(f))
}
