package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

class StreamsSpec extends SparkSpec {

  test("event-time watermark drops data later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Timestamp, String)]
    val windowed = Streams.tumblingCounts(
      src.toDF().toDF("ts", "v"), "ts", "10 minutes", lateness = "5 minutes")
    val q = windowed.writeStream.format("memory")
      .queryName("wm_late_tbl").outputMode("append").start()
    // batch 1: events at 10:00-10:09 advance the watermark to 10:55-5min
    src.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (Timestamp.valueOf("2024-01-01 10:09:00"), "b"),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "c"))
    q.processAllAvailable()
    // batch 2: an event for the long-closed 10:00 window is too late
    src.addData((Timestamp.valueOf("2024-01-01 10:01:00"), "LATE"),
      (Timestamp.valueOf("2024-01-01 11:01:00"), "d"))
    q.processAllAvailable()
    src.stop()
    q.stop()
    val counts = spark.table("wm_late_tbl")
      .as[(Timestamp, Long)].collect().toMap
    // the 10:00 window finalized with 2 rows — the late row never landed
    assert(counts(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
  }

  test("streaming dropDuplicates collapses redelivery across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("id", "v").dropDuplicates("id")
      .writeStream.format("memory").queryName("dedup_replay_tbl")
      .outputMode("append").start()
    src.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    src.addData((2L, "b"), (3L, "c")) // batch 2 redelivers id 2
    q.processAllAvailable()
    src.stop(); q.stop()
    assert(spark.table("dedup_replay_tbl").as[(Long, String)]
      .collect().sorted.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("sessionize: gap-based sessions close on new activity or watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(String, Timestamp)]
    val sessions = Streams.sessionize(
      src.toDF().toDF("user", "ts"), "user", "ts", gap = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_tbl").outputMode("append").start()
    // burst 1: two events 5 min apart = one session
    src.addData(("u1", Timestamp.valueOf("2024-01-01 10:00:00")),
      ("u1", Timestamp.valueOf("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // burst 2 for u1 after a >10min gap closes session 1 inline; u2 starts
    src.addData(("u1", Timestamp.valueOf("2024-01-01 11:00:00")),
      ("u2", Timestamp.valueOf("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // watermark push far ahead: open sessions time out and finalize
    src.addData(("u3", Timestamp.valueOf("2024-01-01 23:00:00")))
    q.processAllAvailable()
    src.addData(("u3", Timestamp.valueOf("2024-01-02 23:00:00")))
    q.processAllAvailable()
    src.stop(); q.stop()
    val out = spark.table("sessions_tbl")
      .as[Session].collect().sortBy(s => (s.key, s.start.getTime))
    val u1 = out.filter(_.key == "u1")
    assert(u1.length == 2)
    assert(u1(0).events == 2 && u1(0).seq == 1 &&
      u1(0).start == Timestamp.valueOf("2024-01-01 10:00:00") &&
      u1(0).end == Timestamp.valueOf("2024-01-01 10:05:00"))
    assert(u1(1).events == 1 && u1(1).seq == 2)
    assert(out.exists(s => s.key == "u2" && s.events == 1 && s.seq == 1))
  }

  test("sessionize parity: streaming rows equal batch gapSessions on full tuples") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(String, Timestamp)]
    val sessions = Streams.sessionize(
      src.toDF().toDF("user", "ts"), "user", "ts", gap = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sess_parity_tbl").outputMode("append").start()
    def ts(s: String) = Timestamp.valueOf(s)
    val batches = Seq(
      Seq("u1" -> ts("2024-01-01 10:00:00"), "u1" -> ts("2024-01-01 10:05:00")),
      Seq("u1" -> ts("2024-01-01 11:00:00"), "u2" -> ts("2024-01-01 11:00:00")),
      // u1 returns after its open session TIMED OUT (quiet across the
      // watermark): seq must continue at 3, not restart
      Seq("u1" -> ts("2024-01-02 09:00:00")),
      // sentinel key drives the watermark forward so every real session
      // times out; its own trailing session stays open and is excluded
      Seq("zz" -> ts("2024-01-02 10:00:00")),
      Seq("zz" -> ts("2024-01-02 12:00:00")))
    batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
    src.stop(); q.stop()
    val streamed = spark.table("sess_parity_tbl").as[Session].collect()
      .filter(_.key != "zz")
      .map(s => (s.key, s.seq, s.start, s.end, s.events)).toSet
    val batchDf = batches.flatten.filter(_._1 != "zz").toDF("user", "ts")
    val batch = graft.operators.Sessionize
      .gapSessions(batchDf, "user", "ts", "10 minutes")
      .as[(String, Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(streamed == batch,
      s"stream/batch session mismatch:\n stream=$streamed\n batch =$batch")
    assert(streamed.exists(s => s._1 == "u1" && s._2 == 3L),
      "u1's post-timeout session must continue numbering at 3")
  }

  test("streaming dedup: duplicates across micro-batches collapse to one survivor") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String)]
    // the streaming face of Dedup.exact: state-backed dropDuplicates
    val deduped = src.toDF().toDF("id", "v").dropDuplicates("id")
    val q = deduped.writeStream.format("memory")
      .queryName("sdedup_tbl").outputMode("append").start()
    src.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch"))
    q.processAllAvailable()
    src.addData((2L, "b-dup-next-batch"), (3L, "c"))
    q.processAllAvailable()
    src.stop(); q.stop()
    val rows = spark.table("sdedup_tbl").as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(2L) == "b") // first occurrence survives across batches
  }

  test("exactly-once file sink: restarting from the checkpoint never re-emits") {
    val dir = tmpDir("eos")
    def runOnce(): Unit = {
      val stream = Tables.loadStream(spark, sf, "events")
      val q = stream.select("event_id").writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n = spark.read.parquet(s"$dir/out").count()
    assert(n == Tables.load(spark, sf, "events").count())
    // same input, same checkpoint: nothing reprocessed, no duplicates
    runOnce()
    assert(spark.read.parquet(s"$dir/out").count() == n)
    assert(spark.read.parquet(s"$dir/out")
      .groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("quality gate routes rejects to the dead-letter dir, delivers the rest") {
    val dir = tmpDir("qgate")
    val stream = Tables.loadStream(spark, sf, "events")
    val policies = Seq(graft.operators.Quality.RowPolicy(
      "evenIds", col("event_id") % 2 === 0, graft.operators.Quality.Optional))
    val q = Streams.qualityGate(stream, policies,
      errDir = s"$dir/err", checkpointDir = s"$dir/ckpt",
      deliver = b => b.select("event_id")
        .write.mode("append").parquet(s"$dir/out"))
    q.awaitTermination()
    val total = Tables.load(spark, sf, "events").count()
    val passed = spark.read.parquet(s"$dir/out")
    val rejected = spark.read.parquet(s"$dir/err")
    assert(passed.count() + rejected.count() == total)
    assert(passed.filter(col("event_id") % 2 =!= 0).count() == 0)
    assert(rejected.filter(col("event_id") % 2 === 0).count() == 0)
  }

  test("quality gate FAIL policy aborts the stream instead of leaking rows") {
    val dir = tmpDir("qgate-fail")
    val stream = Tables.loadStream(spark, sf, "events")
    val policies = Seq(graft.operators.Quality.RowPolicy(
      "noOddIds", col("event_id") % 2 === 0, graft.operators.Quality.Fail))
    val q = Streams.qualityGate(stream, policies,
      errDir = s"$dir/err", checkpointDir = s"$dir/ckpt",
      deliver = b => b.select("event_id")
        .write.mode("append").parquet(s"$dir/out"))
    val e = intercept[Exception] { q.awaitTermination() }
    def mentionsFailure(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(m =>
        m.contains("row policies") && m.contains("failed")) ||
        mentionsFailure(t.getCause))
    assert(mentionsFailure(e), s"unexpected failure: $e")
    assert(!new java.io.File(s"$dir/out").exists())
  }

  test("exactly-once jdbc sink: epoch ledger dedupes redelivered batches") {
    import graft.sinks.JdbcWriter
    import graft.sinks.JdbcWriter.JdbcSpec
    val url = "jdbc:derby:memory:eos_jdbc;create=true"
    val spec = JdbcSpec(url, "ev_sink")
    val dir = tmpDir("eos-jdbc")
    def runOnce(): Unit = {
      val stream = Tables.loadStream(spark, sf, "events").select("event_id")
      val q = Streams.jdbcSinkExactlyOnce(stream, spec, "evs", s"$dir/ckpt")
      q.awaitTermination()
    }
    runOnce()
    val expected = Tables.load(spark, sf, "events").count()
    def count() = spark.read.jdbc(url, "ev_sink", new java.util.Properties()).count()
    assert(count() == expected)
    // checkpoint restart: nothing reprocessed
    runOnce()
    assert(count() == expected)
    // simulate a LOST ACK: the sink already committed epoch 0, then the
    // restart re-delivers it (at-least-once foreachBatch) — the ledger
    // short-circuits, rows do not duplicate
    val batch = Tables.load(spark, sf, "events").select("event_id")
    assert(!JdbcWriter.writeEpochOnce(batch, spec, "evs", epoch = 0L))
    assert(count() == expected)
    // a genuinely new epoch still lands
    assert(JdbcWriter.writeEpochOnce(batch.limit(5), spec, "evs", epoch = 999L))
    assert(count() == expected + 5)
    // the ledger PRIMARY KEY is the real guarantee: a racing promote that
    // slipped past the fast path aborts atomically — rows do not duplicate
    val staged = JdbcWriter.stage(batch.limit(5), spec, "evs_race")
    intercept[java.sql.SQLException] { staged.promote(Some(("evs", 999L))) }
    staged.abort()
    assert(count() == expected + 5)
  }

  test("streaming tumbling counts equal batch counts (stream/batch parity)") {
    val stream = Tables.loadStream(spark, sf, "events")
    val out = Streams.runToCompletion(
      Streams.tumblingCounts(stream, "ts", "1 minute"), "streams_spec_tbl")
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("minute", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("cnt"))
    assert(out.count() == batch.count())
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
  }

  test("asOfEnrich parity: streamed point-in-time lookup equals batch asOf") {
    val ev = Tables.load(spark, sf, "events")
    val dim = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max(col("value")).as("pval"))
    val stream = Tables.loadStream(spark, sf, "events")
      .select("event_id", "user_id", "ts")
    val streamed = Streams.runToCompletionAppend(
      Streams.asOfEnrich(stream, dim, Seq("user_id"), "ts", "pts"),
      "asof_parity_tbl")
      .select("event_id", "pts", "pval")
    val batch = graft.operators.TemporalJoin.asOf(
      ev.select("event_id", "user_id", "ts"), dim, Seq("user_id"), "ts", "pts")
      .select("event_id", "pts", "pval")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream/batch as-of mismatch")
    // left-outer: every event appears exactly once even with no purchase yet
    assert(streamed.count() == ev.count())
  }

  test("dedupWithinWatermark: dups inside the horizon drop, state evicts past it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Timestamp, String)]
    val deduped = Streams.dedupWithinWatermark(
      src.toDF().toDF("id", "ts", "v"), Seq("id"), "ts", delay = "10 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("wm_dedup_tbl").outputMode("append").start()
    // batch 1: two keys; watermark after the batch = 10:01 - 10m = 09:51
    src.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "first"),
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), "b"))
    q.processAllAvailable()
    // batch 2: id 1 redelivered INSIDE the horizon -> dropped; id 3 at
    // 11:00 advances the watermark to 10:50, past both keys' expiry
    // (first-ts + 10m = 10:10 / 10:11) -> their state is evicted
    src.addData((1L, Timestamp.valueOf("2024-01-01 10:05:00"), "dup-in-window"),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), "c"))
    q.processAllAvailable()
    // batch 3: id 1 again, LATER than the horizon — its state is gone, so
    // it re-emits: the semantic proof the state really was evicted
    src.addData((1L, Timestamp.valueOf("2024-01-01 11:30:00"), "re-emit"))
    q.processAllAvailable()
    val evicted = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsRemoved).sum
    val finalState = q.recentProgress.flatMap(_.stateOperators)
      .lastOption.map(_.numRowsTotal)
    src.stop(); q.stop()
    val rows = spark.table("wm_dedup_tbl").as[(Long, Timestamp, String)]
      .collect().map(r => (r._1, r._3)).toSeq.sorted
    assert(rows == Seq((1L, "first"), (1L, "re-emit"), (2L, "b"), (3L, "c")),
      s"got $rows")
    assert(evicted >= 2, s"expected ids 1 and 2 evicted, metrics saw $evicted")
    // ids 1 (re-added) and 3 remain; 4 keys were seen in total
    assert(finalState.exists(_ <= 2), s"state not bounded: $finalState")
  }

  test("streaming fork writes each micro-batch to all sinks") {
    val dir = tmpDir("sfork")
    val stream = Tables.loadStream(spark, sf, "events")
    val q = Streams.forkSinks(stream, s"$dir/ckpt", Seq(
      "a" -> ((b: org.apache.spark.sql.DataFrame) =>
        b.select("event_id", "event_type").write.mode("append").parquet(s"$dir/a")),
      "b" -> ((b: org.apache.spark.sql.DataFrame) =>
        b.filter(col("event_type") === "error").write.mode("append")
          .parquet(s"$dir/b"))))
    q.awaitTermination()
    val n = Tables.load(spark, sf, "events").count()
    assert(spark.read.parquet(s"$dir/a").count() == n)
    assert(spark.read.parquet(s"$dir/b").count() ==
      Tables.load(spark, sf, "events").filter(col("event_type") === "error").count())
  }

  test("intervalJoin: stream-stream matches inside the bounds, drops outside") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ls = MemoryStream[(String, Timestamp, String)]
    val rs = MemoryStream[(String, Timestamp, String)]
    val joined = Streams.intervalJoin(
      ls.toDF().toDF("k", "lts", "lv"), rs.toDF().toDF("k", "rts", "rv"),
      Seq("k"), "lts", "rts",
      lowerBound = "-1 hour", upperBound = "0 seconds", delay = "2 hours")
    val q = joined.writeStream.format("memory")
      .queryName("ssij_tbl").outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    ls.addData(("u1", t("10:00:00"), "L1"), ("u2", t("10:00:00"), "L2"))
    rs.addData(
      ("u1", t("09:30:00"), "in-window"),
      ("u1", t("08:30:00"), "too-early"),
      ("u1", t("10:05:00"), "too-late"),
      ("u2", t("09:59:00"), "in-window-u2"),
      ("u3", t("09:30:00"), "wrong-key"))
    q.processAllAvailable()
    // a right row arriving in a LATER batch still joins if in-window
    rs.addData(("u1", t("09:45:00"), "late-batch-in-window"))
    q.processAllAvailable()
    q.stop(); ls.stop(); rs.stop()
    val got = spark.table("ssij_tbl")
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("L1", "in-window"), ("L2", "in-window-u2"),
      ("L1", "late-batch-in-window")))
  }

  test("intervalJoin left_outer: unmatched rows emit once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ls = MemoryStream[(String, Timestamp, String)]
    val rs = MemoryStream[(String, Timestamp, String)]
    val joined = Streams.intervalJoin(
      ls.toDF().toDF("k", "lts", "lv"), rs.toDF().toDF("k", "rts", "rv"),
      Seq("k"), "lts", "rts",
      lowerBound = "-1 hour", upperBound = "0 seconds",
      delay = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("ssij_outer_tbl").outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    ls.addData(("u1", t("10:00:00"), "matched"), ("u2", t("10:00:00"), "lonely"))
    rs.addData(("u1", t("09:30:00"), "hit"))
    q.processAllAvailable()
    def rows() = spark.table("ssij_outer_tbl")
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // watermark still at the 10:00 batch: the unmatched left row is held
    assert(rows() == Set(("matched", Some("hit"))))
    // both sides advance to 12:00 -> watermark 11:50 passes 10:00 + 0s
    ls.addData(("wm", t("12:00:00"), "wm-l"))
    rs.addData(("wm", t("12:00:00"), "wm-r"))
    q.processAllAvailable()
    q.stop(); ls.stop(); rs.stop()
    assert(rows() == Set(("matched", Some("hit")), ("lonely", None),
      ("wm-l", Some("wm-r"))))
  }

  test("intervalJoin: stream parity with the equivalent batch theta-join on real events") {
    val ev = Tables.load(spark, sf, "events")
    val base = tmpDir("ssij-parity")
    ev.select("event_id", "user_id", "event_type", "ts")
      .repartition(4).write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def side(typ: String, idAs: String, tsAs: String) =
      Streams.fileReplay(spark, s"$base/in", schema, maxFilesPerTrigger = 2)
        .filter(col("event_type") === typ)
        .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
    val streamed = Streams.runToCompletionAppend(
      Streams.intervalJoin(
        side("click", "click_id", "click_ts"),
        side("purchase", "purchase_id", "purchase_ts"),
        Seq("user_id"), "click_ts", "purchase_ts",
        "-1 hour", "0 seconds", delay = "3650 days"),
      "ssij_parity_tbl").select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") - org.apache.spark.sql.functions.expr("interval 1 hour") &&
        col("pts") <= col("cts"))
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "parity set must be non-trivial")
  }
}
