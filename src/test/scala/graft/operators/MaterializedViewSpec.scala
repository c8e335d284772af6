package graft.operators

import graft.{SparkSpec, Tables}
import graft.operators.IncrementalAgg.AggSpec
import graft.state.StateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedViewSpec extends SparkSpec {

  private val keys = Seq("user_id", "event_type")
  private val specs = Seq(
    AggSpec.count("n"), AggSpec.sum("total", col("value")),
    AggSpec.min("vmin", col("value")), AggSpec.max("vmax", col("value")))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("user_id", "event_type")
      .collect().map(_.toSeq.map {
        case d: Double => f"$d%.9g"
        case v => String.valueOf(v)
      }.mkString("|")).toSeq

  test("waves of refresh converge to the full recompute") {
    val ev = Tables.load(spark, sf, "events")
    val dir = tmpDir("mv") + "/view"
    def asOf(d: String) = ev.filter(col("ts") < to_timestamp(lit(d)))
    val s1 = MaterializedView.refresh(spark, dir, asOf("2024-01-08"),
      "ts", keys, specs, "r1")
    assert(s1.bootstrapped && s1.deltaRows > 0)
    val s2 = MaterializedView.refresh(spark, dir, asOf("2024-01-20"),
      "ts", keys, specs, "r2")
    assert(!s2.bootstrapped && s2.deltaRows > 0)
    val s3 = MaterializedView.refresh(spark, dir, ev, "ts", keys, specs, "r3")
    assert(s3.deltaRows > 0)
    assert(canon(MaterializedView.read(spark, dir)) ==
      canon(IncrementalAgg.state(ev, keys, specs)))
    // delta sizes partition the source: nothing folded twice
    assert(s1.deltaRows + s2.deltaRows + s3.deltaRows == ev.count())
  }

  test("refresh with no new rows is a no-op") {
    val ev = Tables.load(spark, sf, "events")
    val dir = tmpDir("mv-noop") + "/view"
    MaterializedView.refresh(spark, dir, ev, "ts", keys, specs, "r1")
    val before = canon(MaterializedView.read(spark, dir))
    val s = MaterializedView.refresh(spark, dir, ev, "ts", keys, specs, "r2")
    assert(s.deltaRows == 0)
    assert(canon(MaterializedView.read(spark, dir)) == before)
  }

  test("streaming sink: micro-batch folds equal the full recompute; replay no-op") {
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val in = tmpDir("mv-stream-in")
    val dir = tmpDir("mv-stream") + "/view"
    // three event-time-ordered arrival files
    val ordered = ev.orderBy("ts", "event_id")
    Seq(ordered.limit(300),
      ordered.limit(700).exceptAll(ordered.limit(300)),
      ev.exceptAll(ordered.limit(700))).zipWithIndex.foreach { case (p, i) =>
      val d = s"$in/f$i"
      p.coalesce(1).write.parquet(d)
      new java.io.File(d).listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val schema = ev.schema
    def run(ckpt: String): Unit = {
      val q = MaterializedView.sink(
        graft.streaming.Streams.fileReplay(spark, s"$in/*", schema),
        dir, "ts", keys, specs, ckpt)
      q.awaitTermination()
    }
    run(tmpDir("mv-stream-ck"))
    val streamed = canon(MaterializedView.read(spark, dir))
    val full = canon(IncrementalAgg.state(ev, keys, specs))
    assert(streamed == full)
    // checkpoint loss: the files replay from scratch, the watermark
    // filters every row out — state unchanged
    run(tmpDir("mv-stream-ck2"))
    assert(canon(MaterializedView.read(spark, dir)) == streamed)
  }

  test("an equal-timestamp group split across micro-batches folds exactly once") {
    // the round-9 advice finding: with event-time-keyed exactly-once, a
    // batch cut between two rows sharing ts silently dropped the later
    // rows. Batch-id keying folds both halves. Two files, one batch
    // each (maxFilesPerTrigger=1): file B continues file A's final
    // second-granularity timestamp.
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").limit(40)
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:00:00"))) // all tied
    val in = tmpDir("mv-tie-in")
    val dir = tmpDir("mv-tie") + "/view"
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    a.coalesce(1).write.parquet(s"$in/fa")
    b.coalesce(1).write.parquet(s"$in/fb")
    new java.io.File(s"$in/fa").listFiles().foreach(_.setLastModified(1000000L))
    new java.io.File(s"$in/fb").listFiles().foreach(_.setLastModified(2000000L))
    val q = MaterializedView.sink(
      graft.streaming.Streams.fileReplay(spark, s"$in/*", ev.schema),
      dir, "ts", keys, specs, tmpDir("mv-tie-ck"))
    q.awaitTermination()
    assert(canon(MaterializedView.read(spark, dir)) ==
      canon(IncrementalAgg.state(ev, keys, specs)),
      "both halves of the tied-timestamp group must be folded")
  }

  test("numeric watermarks compare in the column's type, not as strings") {
    // epoch-long ts: batch A maxes at 9, batch B at 12. A lexicographic
    // string max keeps the stored watermark at "9" (since "9" > "12"),
    // so a fresh-checkpoint replay would re-fold batch B — double count.
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").limit(12)
      .withColumn("ts", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id"))).cast("long"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val in = tmpDir("mv-long-in")
    val dir = tmpDir("mv-long") + "/view"
    ev.filter(col("ts") <= 9).coalesce(1).write.parquet(s"$in/fa")
    ev.filter(col("ts") > 9).coalesce(1).write.parquet(s"$in/fb")
    new java.io.File(s"$in/fa").listFiles().foreach(_.setLastModified(1000000L))
    new java.io.File(s"$in/fb").listFiles().foreach(_.setLastModified(2000000L))
    def run(ckpt: String): Unit = MaterializedView.sink(
      graft.streaming.Streams.fileReplay(spark, s"$in/*", ev.schema),
      dir, "ts", keys, specs, ckpt).awaitTermination()
    run(tmpDir("mv-long-ck"))
    val once = canon(MaterializedView.read(spark, dir))
    assert(once == canon(IncrementalAgg.state(ev, keys, specs)))
    // fresh checkpoint replays everything; watermark must be 12, not 9
    run(tmpDir("mv-long-ck2"))
    assert(canon(MaterializedView.read(spark, dir)) == once,
      "replay re-folded rows above a lexicographically-compared watermark")
  }

  test("same-checkpoint restart folds new rows AT the committed watermark") {
    // the round-10 advice finding: on restart of the SAME checkpoint the
    // event-time filter re-froze at the last committed watermark and
    // dropped never-folded rows tied with it. The birth watermark (frozen
    // when the checkpoint first touched the view) must not move.
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").limit(40)
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:00:00"))) // all tied
    val in = tmpDir("mv-restart-in")
    val dir = tmpDir("mv-restart") + "/view"
    val ckpt = tmpDir("mv-restart-ck")
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    a.coalesce(1).write.parquet(s"$in/fa")
    new java.io.File(s"$in/fa").listFiles().foreach(_.setLastModified(1000000L))
    def run(): Unit = MaterializedView.sink(
      graft.streaming.Streams.fileReplay(spark, s"$in/*", ev.schema),
      dir, "ts", keys, specs, ckpt).awaitTermination()
    run() // first run folds file A; committed watermark == the tied ts
    b.coalesce(1).write.parquet(s"$in/fb")
    new java.io.File(s"$in/fb").listFiles().foreach(_.setLastModified(2000000L))
    run() // restart, SAME checkpoint: file B's rows tie the watermark
    assert(canon(MaterializedView.read(spark, dir)) ==
      canon(IncrementalAgg.state(ev, keys, specs)),
      "rows at the committed watermark were dropped on same-checkpoint restart")
  }

  test("a bootstrap batch of all-null timestamps is skipped, not a null watermark") {
    // review finding: the count-based empty-delta check let an all-null
    // ts batch commit a NULL watermark (NPE in the state store)
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(10)
      .withColumn("ts", lit(null).cast("timestamp"))
    val in = tmpDir("mv-nullts-in")
    val dir = tmpDir("mv-nullts") + "/view"
    ev.coalesce(1).write.parquet(s"$in/fa")
    val q = MaterializedView.sink(
      graft.streaming.Streams.fileReplay(spark, s"$in/*", ev.schema),
      dir, "ts", keys, specs, tmpDir("mv-nullts-ck"))
    q.awaitTermination() // must not throw; batch treated as empty
    assert(!new java.io.File(s"$dir/agg").exists,
      "an all-null-ts batch folds nothing")
  }

  test("a half-applied refresh is refused, not silently double-counted") {
    val ev = Tables.load(spark, sf, "events")
    val dir = tmpDir("mv-crash") + "/view"
    MaterializedView.refresh(spark, dir, ev, "ts", keys, specs, "r1")
    // simulate a crash between watermark-read commit and applied commit
    val store = new StateStore(spark, s"$dir/state")
    store.commit(Map(("mv-watermark", "") -> "2099-01-01 00:00:00"), "crash")
    val e = intercept[IllegalArgumentException] {
      MaterializedView.refresh(spark, dir, ev, "ts", keys, specs, "r2")
    }
    assert(e.getMessage.contains("half-refreshed"))
  }
}
