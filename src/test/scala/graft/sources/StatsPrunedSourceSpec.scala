package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatsPrunedSourceSpec extends SparkSpec {

  test("range read equals the plain filter while opening fewer files") {
    val dir = tmpDir("zonemap")
    val orders = Tables.load(spark, sf, "orders")
    StatsPrunedSource.writeWithStats(orders, dir, "o_totalprice",
      numFiles = 16)
    val (lo, hi) = (lit(50000.0), lit(80000.0))
    val (pruned, kept, total) = StatsPrunedSource.readRange(
      spark, dir, "o_totalprice", lo, hi)
    val expect = orders
      .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 80000.0)
    assert(pruned.count() == expect.count())
    assert(pruned.agg(sum("o_orderkey")).head().getLong(0) ==
      expect.agg(sum("o_orderkey")).head().getLong(0))
    assert(total == 16, s"writer must produce the requested file count")
    assert(kept < total,
      s"a narrow range over a range-clustered table must prune: $kept/$total")
  }

  test("empty probe range reads zero files and returns a typed empty frame") {
    val dir = tmpDir("zonemap-empty")
    val orders = Tables.load(spark, sf, "orders")
    StatsPrunedSource.writeWithStats(orders, dir, "o_totalprice", numFiles = 8)
    val (frame, kept, _) = StatsPrunedSource.readRange(
      spark, dir, "o_totalprice", lit(-2.0), lit(-1.0))
    assert(kept == 0)
    assert(frame.count() == 0)
    assert(frame.columns.toSeq == orders.columns.toSeq,
      "empty result keeps the table schema")
  }

  test("boundaries are inclusive on both ends") {
    val dir = tmpDir("zonemap-edge")
    val orders = Tables.load(spark, sf, "orders")
    StatsPrunedSource.writeWithStats(orders, dir, "o_orderkey", numFiles = 8)
    val someKey = orders.agg(max("o_orderkey")).head().getLong(0)
    val (frame, kept, _) = StatsPrunedSource.readRange(
      spark, dir, "o_orderkey", lit(someKey), lit(someKey))
    assert(frame.count() ==
      orders.filter(col("o_orderkey") === someKey).count())
    assert(kept >= 1)
  }

  test("timestamp stat columns prune date-range probes") {
    val dir = tmpDir("zonemap-ts")
    val ev = Tables.load(spark, sf, "events")
    StatsPrunedSource.writeWithStats(ev, dir, "ts", numFiles = 16)
    val (frame, kept, total) = StatsPrunedSource.readRange(spark, dir, "ts",
      to_timestamp(lit("2024-01-10 00:00:00")),
      to_timestamp(lit("2024-01-12 00:00:00")))
    val expect = ev.filter(col("ts") >= to_timestamp(lit("2024-01-10 00:00:00"))
      && col("ts") <= to_timestamp(lit("2024-01-12 00:00:00")))
    assert(frame.count() == expect.count() && expect.count() > 0)
    assert(kept < total, s"2 days of 30 must prune most files: $kept/$total")
  }
}
