package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def toDf(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t, ty, i.toLong) }
      .toDF("user_id", "t", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds(col("t")))

  private def depths(rows: Seq[(Long, Long, String)]): Map[Long, Long] =
    Funnel.depth(toDf(rows), "user_id", "ts", "event_type", stages, "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("semantics table: ordered progression, out-of-order ignored") {
    val got = depths(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full
      (2L, 10L, "view"), (2L, 20L, "click"),                        // depth 2
      (3L, 20L, "view"), (3L, 10L, "click"),                        // click BEFORE view
      (4L, 10L, "click"), (4L, 20L, "purchase"),                    // never viewed
      (5L, 10L, "purchase"), (5L, 20L, "view"),
      (6L, 10L, "error")                                            // depth 0
    ))
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 1L, 6L -> 0L))
  }

  test("equal timestamps certify in tie-order") {
    // view and click at the SAME ts: tie column (insertion order) puts
    // view first → the click row's prefix holds reach0 and certifies
    assert(depths(Seq((1L, 10L, "view"), (1L, 10L, "click"))) == Map(1L -> 2L))
    // reversed tie order: the click's prefix has no view yet → depth 1
    assert(depths(Seq((2L, 10L, "click"), (2L, 10L, "view"))) == Map(2L -> 1L))
  }

  test("a later re-view cannot resurrect an earlier click") {
    // click at 20 with first view at 30: click precedes every view
    val got = depths(Seq((1L, 20L, "click"), (1L, 30L, "view"), (1L, 40L, "purchase")))
    // purchase at 40 needs a certified click ≥ a view — none exists
    assert(got == Map(1L -> 1L))
  }

  test("single window lineage: one exchange, one sort for all stages") {
    val ev = Tables.load(spark, sf, "events")
    val plan = Funnel.depth(ev, "user_id", "ts", "event_type", stages,
      "event_id").queryExecution.executedPlan.toString
    val sorts = "\\bSort\\b".r.findAllIn(plan).length
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(sorts == 1, s"expected one sort, plan:\n$plan")
    assert(exchanges == 1, s"expected one exchange, plan:\n$plan")
  }

  test("report is the suffix-sum of depth counts on real events") {
    val ev = Tables.load(spark, sf, "events")
    val d = Funnel.depth(ev, "user_id", "ts", "event_type", stages, "event_id")
      .collect().map(_.getLong(1))
    val rep = Funnel.report(ev, "user_id", "ts", "event_type", stages, "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep.keySet == Set(1L, 2L, 3L))
    (1 to 3).foreach { k =>
      assert(rep(k.toLong) == d.count(_ >= k).toLong, s"depth>=$k")
    }
  }
}
