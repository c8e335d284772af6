package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.{Session, Streams}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  private val eventData = Seq(
    ("u1", "10:00:00"), ("u1", "10:05:00"), ("u1", "11:00:00"),
    ("u2", "11:00:00"), ("u3", "23:00:00"))

  test("gapSessions: sessions split on quiet gaps, seq numbers in time order") {
    val events = eventData.toDF("user", "s")
      .select($"user", concat(lit("2024-01-01 "), $"s").cast("timestamp").as("ts"))
    val out = Sessionize.gapSessions(events, "user", "ts", "10 minutes")
      .orderBy("user", "session_seq")
      .as[(String, Long, Timestamp, Timestamp, Long)].collect().toSeq
    assert(out == Seq(
      ("u1", 1L, ts("10:00:00"), ts("10:05:00"), 2L),
      ("u1", 2L, ts("11:00:00"), ts("11:00:00"), 1L),
      ("u2", 1L, ts("11:00:00"), ts("11:00:00"), 1L),
      ("u3", 1L, ts("23:00:00"), ts("23:00:00"), 1L)))
  }

  test("batch/stream parity: gapSessions equals the flatMapGroupsWithState face") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Timestamp)]
    val streamed = Streams.sessionize(
      src.toDF().toDF("user", "ts"), "user", "ts", gap = "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("parity_sessions").outputMode("append").start()
    src.addData(eventData.map { case (u, s) => (u, ts(s)) }: _*)
    q.processAllAvailable()
    // watermark sentinel far ahead flushes the open sessions
    src.addData(("zz", Timestamp.valueOf("2024-01-05 00:00:00")))
    q.processAllAvailable()
    src.addData(("zz", Timestamp.valueOf("2024-01-09 00:00:00")))
    q.processAllAvailable()
    src.stop(); q.stop()
    val streamSet = spark.table("parity_sessions").as[Session].collect()
      .filter(_.key != "zz")
      .map(s => (s.key, s.start, s.end, s.events.toLong)).toSet

    val events = eventData.toDF("user", "s")
      .select($"user", concat(lit("2024-01-01 "), $"s").cast("timestamp").as("ts"))
    val batchSet = Sessionize.gapSessions(events, "user", "ts", "10 minutes")
      .select("user", "session_start", "session_end", "n_events")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSet
    assert(streamSet == batchSet)
  }

  test("hot key: one dense 20k-event micro-batch folds into one interval, unsorted") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Timestamp)]
    val streamed = Streams.sessionize(
      src.toDF().toDF("user", "ts"), "user", "ts", gap = "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("hotkey_sessions").outputMode("append").start()
    // a bot key bursting 20k events 1s apart, delivered in scrambled
    // order, plus a second burst past the gap — all in ONE batch
    val rng = new scala.util.Random(7)
    val burst1 = (0 until 20000).map(i =>
      ("bot", new Timestamp(ts("00:00:00").getTime + i * 1000L)))
    val burst2 = (0 until 100).map(i =>
      ("bot", new Timestamp(ts("12:00:00").getTime + i * 1000L)))
    src.addData(rng.shuffle(burst1 ++ burst2): _*)
    q.processAllAvailable()
    src.addData(("zz", Timestamp.valueOf("2024-01-09 00:00:00")))
    q.processAllAvailable()
    src.stop(); q.stop()
    val out = spark.table("hotkey_sessions").as[Session].collect()
      .filter(_.key == "bot").sortBy(_.start.getTime)
    assert(out.length == 2, out.mkString(","))
    assert(out(0).events == 20000 && out(0).start == ts("00:00:00") &&
      out(0).end == new Timestamp(ts("00:00:00").getTime + 19999 * 1000L))
    assert(out(1).events == 100)
  }

  test("gapSessions plans exactly one shuffle (windows + agg share the key partitioning)") {
    val events = graft.Tables.load(spark, sf, "events")
    val p = Sessionize.gapSessions(events, "user_id", "ts", "2 hours")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 Exchange, plan:\n$p")
  }
}
