package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration._
import scala.concurrent.{ExecutionContext, Future}

import graft.SparkSpec

/** Probe shared by executor closures — same JVM under local[*]. */
object AsyncEnrichProbe {
  val current = new AtomicInteger(0)
  val maxSeen = new AtomicInteger(0)
  def reset(): Unit = { current.set(0); maxSeen.set(0) }
  def enter(): Unit = {
    val c = current.incrementAndGet()
    maxSeen.updateAndGet(m => math.max(m, c)): Unit
  }
  def exit(): Unit = { current.decrementAndGet(): Unit }
}

class AsyncEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("enrich matches a sequential map and preserves record order") {
    // deterministic but staggered completion: later records often finish
    // FIRST, so any completion-order leak breaks the assertion
    val ds = spark.range(0, 500).as[Long].repartition(4)
    val expected = ds.collect().toSeq.map(x => x * 3 + 1)
    val out = AsyncEnrich.enrich(ds, maxInFlight = 8, timeout = 30.seconds) {
      x =>
        // the EC is resolved on the EXECUTOR (a captured global would not
        // serialize); method call, nothing captured
        implicit val ec: ExecutionContext = ExecutionContext.global
        Future { if (x % 7 == 0) Thread.sleep(3); x * 3 + 1 }
    }.collect().toSeq
    assert(out == expected)
  }

  test("in-flight calls never exceed the bound") {
    AsyncEnrichProbe.reset()
    val ds = spark.range(0, 200).as[Long].repartition(1)
    AsyncEnrich.enrich(ds, maxInFlight = 4, timeout = 30.seconds) { x =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      Future {
        AsyncEnrichProbe.enter()
        try { Thread.sleep(1); x } finally AsyncEnrichProbe.exit()
      }
    }.collect()
    assert(AsyncEnrichProbe.maxSeen.get() <= 4,
      s"saw ${AsyncEnrichProbe.maxSeen.get()} concurrent calls, bound 4")
    assert(AsyncEnrichProbe.maxSeen.get() >= 2,
      "expected genuine overlap, saw none — pipeline is serialized")
  }

  test("a failed future surfaces as a task failure, not a silent drop") {
    val ds = spark.range(0, 10).as[Long].repartition(1)
    val ex = intercept[org.apache.spark.SparkException] {
      AsyncEnrich.enrich(ds, maxInFlight = 2, timeout = 30.seconds) { x =>
        if (x == 5) Future.failed(new IllegalStateException("boom"))
        else Future.successful(x)
      }.collect()
    }
    assert(ex.getMessage.contains("boom") ||
      Option(ex.getCause).exists(_.getMessage.contains("boom")))
  }
}
