package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes: DataFrame = Seq(
    ("A", ts("2024-01-01 09:00:00"), 10.0),
    ("A", ts("2024-01-01 09:05:00"), 11.0),
    ("A", ts("2024-01-01 09:10:00"), 12.0),
    ("B", ts("2024-01-01 09:02:00"), 50.0)
  ).toDF("sym", "qts", "px")

  private lazy val trades: DataFrame = Seq(
    (1L, "A", ts("2024-01-01 08:59:00")), // before first quote -> null
    (2L, "A", ts("2024-01-01 09:05:00")), // exact tie -> inclusive match 11.0
    (3L, "A", ts("2024-01-01 09:07:30")), // between -> 11.0
    (4L, "A", ts("2024-01-01 09:59:00")), // after last -> 12.0
    (5L, "B", ts("2024-01-01 09:02:01")), // other key -> 50.0
    (6L, "C", ts("2024-01-01 09:02:01"))  // key with no quotes -> null
  ).toDF("trade_id", "sym", "tts")

  test("asOf matches latest right row at-or-before each left ts per key") {
    val out = TemporalJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts")
      .select("trade_id", "qts", "px").as[(Long, Option[java.sql.Timestamp], Option[Double])]
      .collect().map(r => r._1 -> (r._2.map(_.toString), r._3)).toMap
    assert(out(1L) == (None, None))
    assert(out(2L) == (Some("2024-01-01 09:05:00.0"), Some(11.0)))
    assert(out(3L) == (Some("2024-01-01 09:05:00.0"), Some(11.0)))
    assert(out(4L) == (Some("2024-01-01 09:10:00.0"), Some(12.0)))
    assert(out(5L) == (Some("2024-01-01 09:02:00.0"), Some(50.0)))
    assert(out(6L) == (None, None))
    // left-outer: every trade survives exactly once
    assert(TemporalJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts")
      .count() == trades.count())
  }

  test("asOf equals the brute-force theta-join + argmax definition") {
    // random-ish data via hash arithmetic (deterministic, no RNG)
    val left = spark.range(200).select(
      col("id").as("lid"),
      (pmod(xxhash64(col("id")), lit(7))).cast("string").as("k"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id"), lit(1)), lit(50000))).as("lts"))
    val right = spark.range(60).select(
      (pmod(xxhash64(col("id"), lit(2)), lit(7))).cast("string").as("k"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id"), lit(3)), lit(50000))).as("rts"),
      col("id").as("payload"))
      // kill exact (k, rts) dups so both definitions are deterministic
      .groupBy("k", "rts").agg(max("payload").as("payload"))
    val got = TemporalJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .select("lid", "rts", "payload")
    val want = left.join(right, Seq("k"), "left")
      .filter(col("rts").isNull || col("rts") <= col("lts"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lid")
          .orderBy(col("rts").desc_nulls_last)))
      .filter(col("__rn") === 1)
      // a lid whose every right row is later gets filtered rows only when
      // some null-rts row exists; rebuild true left-outer via anti+union
      .select("lid", "rts", "payload")
    val wantFull = left.select("lid").join(want, Seq("lid"), "left")
    assert(got.exceptAll(wantFull).isEmpty && wantFull.exceptAll(got).isEmpty,
      "asOf disagrees with brute-force definition")
  }

  test("asOf plan: ONE exchange, no join node") {
    val plan = TemporalJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // formatted explain prints each node twice (tree + detail section);
    // count the numbered detail headers only
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges == 1, s"want exactly 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("asOf rejects colliding payload names and missing ts") {
    val bad = quotes.withColumnRenamed("px", "tts")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asOf(trades, bad, Seq("sym"), "tts", "qts")
    }
    assert(e.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoin.asOf(trades, quotes, Seq("sym", "qts"), "tts", "qts")
    }
    assert(e2.getMessage.contains("non-key"))
  }

  private lazy val windows: DataFrame = Seq(
    (ts("2024-01-01 09:00:30"), ts("2024-01-01 09:02:30"), "w1"),
    (ts("2024-01-01 09:02:00"), ts("2024-01-01 09:04:00"), "w2"), // overlaps w1
    (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), "empty")
  ).toDF("ws", "we", "wname")

  test("pointInRange pairs each point with every containing interval") {
    val pts = Seq(
      (1L, ts("2024-01-01 09:00:29")), // before w1
      (2L, ts("2024-01-01 09:00:30")), // w1 start inclusive
      (3L, ts("2024-01-01 09:02:15")), // w1 AND w2 (overlap)
      (4L, ts("2024-01-01 09:02:30")), // w1 end exclusive -> w2 only
      (5L, ts("2024-01-01 10:00:00"))  // empty interval matches nothing
    ).toDF("pid", "pts")
    val out = TemporalJoin.pointInRange(pts, "pts", windows, "ws", "we",
      binSeconds = 60)
      .select("pid", "wname").as[(Long, String)].collect().toSet
    assert(out == Set(2L -> "w1", 3L -> "w1", 3L -> "w2", 4L -> "w2"))
  }

  test("pointInRange equals the plain theta-join on hashed data, any bin") {
    val pts = spark.range(300).select(col("id").as("pid"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id")), lit(20000))).as("pts"))
    val ivs = spark.range(25).select(col("id").as("ivid"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id"), lit(9)), lit(18000))).as("ws"))
      .withColumn("we", col("ws") + expr("INTERVAL 37 MINUTES"))
    val want = pts.join(ivs, col("pts") >= col("ws") && col("pts") < col("we"))
      .select("pid", "ivid")
    for (bin <- Seq(7L, 600L, 86400L)) {
      val got = TemporalJoin.pointInRange(pts, "pts", ivs, "ws", "we", bin)
        .select("pid", "ivid")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"bin=$bin disagrees with theta-join")
    }
  }

  test("pointInRange plan: hash join on bins, never a nested loop") {
    val pts = spark.range(100).select(col("id").as("pid"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("pts"))
    val plan = TemporalJoin.pointInRange(pts, "pts", windows, "ws", "we", 60)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$plan")
  }

  test("pointInRange fails loudly on a runaway interval") {
    val pts = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("pid", "pts")
    val wide = Seq((ts("2024-01-01 00:00:00"), ts("2026-01-01 00:00:00"), "w"))
      .toDF("ws", "we", "wname")
    val e = intercept[Exception] {
      TemporalJoin.pointInRange(pts, "pts", wide, "ws", "we",
        binSeconds = 1, maxBinsPerInterval = 1000).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("pointInRange"),
      s"wanted the runaway-interval error, got: ${e.getMessage}")
  }
}
