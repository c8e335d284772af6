package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sinks.SnapshotLog
import org.apache.spark.sql.functions._

class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed epochs union back to exactly the source table") {
    val base = tmpDir("snapstream")
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type")
    ev.repartition(4).write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val q = SnapshotStream.sink(
      Streams.fileReplay(spark, s"$base/in", schema, maxFilesPerTrigger = 2),
      s"$base/log", "events", s"$base/ckpt")
    q.awaitTermination()
    val log = new SnapshotLog(spark, s"$base/log")
    val ids = SnapshotStream.epochs(log, "events")
    assert(ids.size >= 2, s"want multiple epochs, got $ids")
    val got = SnapshotStream.readTable(log, "events")
    assert(got.count() == ev.count())
    assert(got.exceptAll(ev).isEmpty && ev.exceptAll(got).isEmpty)
  }

  test("a replayed batch id is a manifest-level no-op") {
    val base = tmpDir("snapstream-replay")
    val log = new SnapshotLog(spark, s"$base/log")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(SnapshotStream.appendEpoch(log, "t", 0L, b0))
    val before = log.currentId()
    // at-least-once redelivery of the same epoch: refused, no new snapshot
    assert(!SnapshotStream.appendEpoch(log, "t", 0L,
      Seq((9L, "dup")).toDF("k", "v")))
    assert(log.currentId() == before)
    assert(SnapshotStream.readTable(log, "t").count() == 2)
  }

  test("time travel excludes later epochs; incremental read sees only them") {
    val base = tmpDir("snapstream-tt")
    val log = new SnapshotLog(spark, s"$base/log")
    SnapshotStream.appendEpoch(log, "t", 0L, Seq((1L, "a")).toDF("k", "v"))
    val snapAfter0 = log.currentId().get
    SnapshotStream.appendEpoch(log, "t", 1L, Seq((2L, "b")).toDF("k", "v"))
    SnapshotStream.appendEpoch(log, "t", 2L, Seq((3L, "c")).toDF("k", "v"))
    assert(SnapshotStream.readTable(log, "t").count() == 3)
    assert(SnapshotStream.readTable(log, "t", asOf = Some(snapAfter0))
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    val inc = SnapshotStream.readAppendsSince(log, "t", afterBatch = 0L)
      .as[(Long, String)].collect().toSet
    assert(inc == Set((2L, "b"), (3L, "c")))
    // fully caught up: empty but schema-typed
    val none = SnapshotStream.readAppendsSince(log, "t", afterBatch = 2L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))
  }

  test("epoch compaction folds branches, keeps data, refuses folded replays") {
    val base = tmpDir("snapstream-compact")
    val log = new SnapshotLog(spark, s"$base/log")
    (0 to 3).foreach(i => SnapshotStream.appendEpoch(log, "t", i.toLong,
      Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val preCompact = log.currentId().get
    SnapshotStream.compactEpochs(log, "t", 2L)
    assert(SnapshotStream.epochs(log, "t") == Seq(2L, 3L))
    assert(SnapshotStream.readTable(log, "t")
      .as[(Long, String)].collect().toSet ==
      Set((0L, "v0"), (1L, "v1"), (2L, "v2"), (3L, "v3")))
    // time travel BEFORE the fold still sees the original epoch layout
    assert(SnapshotStream.epochs(log, "t", asOf = Some(preCompact)) ==
      Seq(0L, 1L, 2L, 3L))
    // replay of a folded-away epoch id must still be refused
    assert(!SnapshotStream.appendEpoch(log, "t", 1L,
      Seq((99L, "dup")).toDF("k", "v")))
    assert(SnapshotStream.readTable(log, "t").count() == 4)
    // incremental consumers past the fold are unaffected
    assert(SnapshotStream.readAppendsSince(log, "t", afterBatch = 2L)
      .as[(Long, String)].collect().toSet == Set((3L, "v3")))
  }

  test("sink restart with a fresh checkpoint re-ingests nothing") {
    val base = tmpDir("snapstream-restart")
    val ev = Tables.load(spark, sf, "events").select("event_id", "user_id")
    ev.repartition(4).write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String) = {
      val q = SnapshotStream.sink(
        Streams.fileReplay(spark, s"$base/in", schema, maxFilesPerTrigger = 2),
        s"$base/log", "events", ckpt)
      q.awaitTermination()
    }
    run(s"$base/ckpt1")
    val n1 = SnapshotStream.readTable(
      new SnapshotLog(spark, s"$base/log"), "events").count()
    // checkpoint LOSS: the same files replay as the same batch ids, every
    // epoch is already committed, the table must not grow
    run(s"$base/ckpt2")
    val n2 = SnapshotStream.readTable(
      new SnapshotLog(spark, s"$base/log"), "events").count()
    assert(n1 == ev.count() && n2 == n1)
  }
}
