package graft.planning

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}

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

  test("splitTime keeps the partial trailing unit (non-aligned high)") {
    // [Jan1 00:00, Jan3 12:00] at day granularity: unit.between truncates
    // to 2 days — the final chunk must still top out at 12:00, not 00:00
    val lo = Timestamp.valueOf("1995-01-01 00:00:00")
    val hi = Timestamp.valueOf("1995-01-03 12:00:00")
    val chunks = splitTime(lo, hi, DateWm, 2)
    assert(chunks.head.low == lo)
    assert(chunks.last.high == hi, s"tail lost: ${chunks.last}")
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.high == b.low)
      case _ =>
    }
    // and the chunked scan over real data equals the direct range filter
    val orders = Tables.load(spark, sf, "orders")
    val lo2 = Timestamp.valueOf("1995-06-01 00:00:00")
    val hi2 = Timestamp.valueOf("1995-08-15 09:30:00")
    val chunked = incrementalScan(orders, "o_orderdate", lo2, hi2, DateWm, 4)
    val direct = orders.filter(
      col("o_orderdate") > lit(lo2) && col("o_orderdate") <= lit(hi2))
    assert(chunked.count() == direct.count())
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

  test("pkChunks covers [min,max] exactly once, sized from count") {
    import WatermarkPartitioner._
    // 1000 keys over a 10k span at 100 rows/chunk -> 10 chunks
    val chunks = pkChunks(min = 5L, max = 10004L, count = 1000L,
      targetRowsPerChunk = 100L)
    assert(chunks.size == 10)
    assert(chunks.head._1 == 5L && chunks.last._2 == 10004L)
    // inclusive ranges: consecutive chunks abut with no gap or overlap
    chunks.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(lo2 == hi + 1, s"gap/overlap at $hi -> $lo2")
    }
    // degenerate cases
    assert(pkChunks(1, 0, 10, 5) == Nil)
    assert(pkChunks(7, 7, 3, 1) == Seq((7L, 7L)))
    // span smaller than wanted chunk count: one chunk per key at most
    assert(pkChunks(1, 3, 1000, 1).size == 3)

    // the scan face: chunk union equals the table exactly once
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey")
    val scanned = pkChunkedScan(orders, "o_orderkey", targetRowsPerChunk = 250)
    assert(scanned.count() == orders.count())
    assert(scanned.distinct().count() == orders.distinct().count())
  }

  test("binPacker balanced: all items placed, bins within a largest-item spread") {
    import BinPacker._
    val items = (1 to 40).map(i => Item(s"f$i", (i * 37 % 100 + 1).toLong))
    val bins = packBalanced(items, 6)
    assert(bins.size == 6)
    assert(bins.flatMap(_.ids).sorted == items.map(_.id).sorted)
    val ws = bins.map(_.weight)
    val largest = items.map(_.weight).max
    assert(ws.max - ws.min <= largest,
      s"imbalance ${ws.max - ws.min} exceeds largest item $largest")
    // deterministic: same input -> same packing
    assert(packBalanced(items, 6).map(_.ids) == bins.map(_.ids))
  }

  test("binPacker capped: capacity respected, oversized items isolated") {
    import BinPacker._
    val items = Seq(Item("huge", 500L), Item("a", 60L), Item("b", 50L),
      Item("c", 40L), Item("d", 30L), Item("e", 10L))
    val bins = packCapped(items, capacity = 100L)
    assert(bins.flatMap(_.ids).sorted == items.map(_.id).sorted)
    // the oversized item sits alone; every other bin is under capacity
    assert(bins.filter(_.ids.contains("huge")).head.ids == Vector("huge"))
    assert(bins.filterNot(_.ids.contains("huge")).forall(_.weight <= 100L))
  }
}
