package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DriftCheckSpec extends SparkSpec {
  import spark.implicits._

  private def tv(a: Seq[(String, Long)], b: Seq[(String, Long)]): Long =
    DriftCheck.tvDrift(
      a.toDF("g", "bin"), b.toDF("g", "bin"), "bin", Seq("g"))
      .collect()(0).getAs[Long]("tv_permille")

  test("identical distributions score 0, disjoint score 1000") {
    val d = Seq(("x", 1L), ("x", 1L), ("x", 2L))
    assert(tv(d, d) == 0L)
    assert(tv(d, Seq(("x", 9L), ("x", 8L))) == 1000L)
  }

  test("known half-shift scores exactly 500 permille") {
    // A: 100% bin 1. B: 50% bin 1, 50% bin 2 → TV = 0.5
    val a = Seq(("x", 1L), ("x", 1L))
    val b = Seq(("x", 1L), ("x", 2L))
    assert(tv(a, b) == 500L)
  }

  test("scale invariance: tripling one side's row count changes nothing") {
    val a = Seq(("x", 1L), ("x", 2L), ("x", 2L))
    val b = Seq(("x", 1L), ("x", 1L), ("x", 2L))
    val once = tv(a, b)
    assert(once == tv(a.flatMap(r => Seq(r, r, r)), b))
    assert(once == 333L) // |1/3-2/3| + |2/3-1/3| over 2 = 1/3
  }

  test("groups are independent; one-sided groups score 1000") {
    val a = Seq(("g1", 1L), ("g2", 1L)).toDF("g", "bin")
    val b = Seq(("g1", 1L), ("g3", 1L)).toDF("g", "bin")
    val out = DriftCheck.tvDrift(a, b, "bin", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tv_permille")).toMap
    assert(out == Map("g1" -> 0L, "g2" -> 1000L, "g3" -> 1000L))
  }

  test("ungrouped face and real-data sanity: same window of events drifts 0") {
    val ev = Tables.load(spark, sf, "events")
      .select(floor(col("value")).as("bin"))
    val out = DriftCheck.tvDrift(ev, ev, "bin")
      .collect()(0)
    assert(out.getAs[Long]("tv_permille") == 0L)
    assert(out.getAs[Long]("n_a") == out.getAs[Long]("n_b"))
  }
}
