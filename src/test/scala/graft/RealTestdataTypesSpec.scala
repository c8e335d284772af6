package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.operators.{Sessionize, TemporalJoin}
import graft.streaming.Streams

/** Round-8 regression class: every time-sensitive operator here runs on
  * inputs loaded via `Tables.load` — the REAL testdata parquet types —
  * not on synthesized `to_timestamp` frames. The testdata's `events.ts`
  * has arrived as parquet TIMESTAMP(NANOS) in early rounds and as
  * timezone-less timestamp[us] (Spark 4 → TIMESTAMP_NTZ) since; units
  * that build their own frames missed that `withWatermark` (q15) and
  * `unix_micros` (q96) reject NTZ while plain comparisons tolerate it.
  * This suite fails the moment `Tables.normalizeTs` stops delivering a
  * plain TIMESTAMP to the operators, whatever shape the driver ships
  * next.
  */
class RealTestdataTypesSpec extends SparkSpec {

  private def events = Tables.load(spark, sf, "events")

  test("Tables.load normalizes events.ts to TIMESTAMP (not NTZ, not long)") {
    assert(events.schema("ts").dataType == TimestampType)
    assert(events.filter(col("ts").isNull).count() == 0)
  }

  test("Tables.loadStream schema carries TIMESTAMP ts (withWatermark-able)") {
    val s = Tables.loadStream(spark, sf, "events")
    assert(s.schema("ts").dataType == TimestampType)
  }

  test("withWatermark + window run on real testdata types (q15 path)") {
    val stream = Tables.loadStream(spark, sf, "events", maxFilesPerTrigger = 1)
    val out = Streams.runToCompletion(
      Streams.tumblingCounts(stream, "ts", "1 hour"), "real_types_q15")
    val batch = events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("cnt"))
    assert(out.count() > 0)
    assert(out.except(batch).isEmpty && batch.except(out).isEmpty)
  }

  test("pointInRange runs on real testdata types (q96 path)") {
    val iv = events.limit(50)
      .select(col("user_id").as("iv_user"),
        col("ts").as("iv_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("iv_end"))
    val joined = TemporalJoin.pointInRange(
      events.select("event_id", "ts"), "ts", iv, "iv_start", "iv_end",
      binSeconds = 3600)
    assert(joined.count() > 0)
  }

  test("asOf runs on real testdata types (q95 path)") {
    val right = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
    val out = TemporalJoin.asOf(
      events.select("event_id", "user_id", "ts"), right,
      Seq("user_id"), "ts", "first_ts")
    assert(out.count() == events.count())
  }

  test("sessionize + duration run on real testdata types (q44 path)") {
    val s = Sessionize.withDuration(
      Sessionize.gapSessions(events, "user_id", "ts", "30 minutes"))
    assert(s.count() > 0)
    assert(s.filter(col("duration_sec") < 0).count() == 0)
  }

  test("late-data split runs on real testdata types") {
    val wm = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val (onTime, late) = graft.operators.LateData.splitLate(events, "ts", wm)
    assert(late.count() == events.count() && onTime.count() == 0)
  }
}
