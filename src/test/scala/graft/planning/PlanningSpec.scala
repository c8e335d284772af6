package graft.planning

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import graft.planning.WatermarkPartitioner._

class PlanningSpec extends SparkSpec {

  test("splitNumeric covers the interval exactly, half-open") {
    val chunks = splitNumeric(0, 100, 7)
    assert(chunks.head.low == 0 && chunks.last.high == 100)
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.high == b.low)
      case _ =>
    }
    assert(chunks.size <= 7)
  }

  test("splitNumeric never makes more chunks than values") {
    assert(splitNumeric(10, 12, 100).size == 2)
    assert(splitNumeric(5, 5, 3).isEmpty)
  }

  test("splitTime day granularity covers the interval") {
    val chunks = splitTime(Timestamp.valueOf("1995-06-01 00:00:00"),
      Timestamp.valueOf("1995-06-11 00:00:00"), DateWm, 4)
    assert(chunks.head.low == Timestamp.valueOf("1995-06-01 00:00:00"))
    assert(chunks.last.high == Timestamp.valueOf("1995-06-11 00:00:00"))
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.high == b.low)
      case _ =>
    }
  }

  test("incrementalScan union equals single range filter") {
    val orders = Tables.load(spark, sf, "orders")
    val lo = Timestamp.valueOf("1995-06-01 00:00:00")
    val hi = Timestamp.valueOf("1996-06-01 00:00:00")
    val chunked = incrementalScan(orders, "o_orderdate", lo, hi, DateWm, 4)
    import org.apache.spark.sql.functions._
    val direct = orders.filter(col("o_orderdate") > lo && col("o_orderdate") <= hi)
    assert(chunked.count() == direct.count())
    assert(chunked.exceptAll(direct).isEmpty)
  }

  test("empty interval yields empty scan") {
    val orders = Tables.load(spark, sf, "orders")
    val t = Timestamp.valueOf("1995-06-01 00:00:00")
    assert(incrementalScan(orders, "o_orderdate", t, t, DateWm, 4).count() == 0)
  }
}
