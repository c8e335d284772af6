package graft.planning

import graft.SparkSpec
import graft.planning.OffsetRangePlanner._
import graft.state.StateStore

class OffsetLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def broker(maxOff: Long) =
    (0 until 2).flatMap(p => (0L until maxOff).map(o => (p, o, s"m$p-$o")))
      .toDF("part", "off", "payload")

  test("multi-run resume: each run extracts exactly the delta, union covers the log once") {
    val store = new StateStore(spark, tmpDir("offsets-resume"))

    // run 1: first run consumes the whole retained log [0, 10)
    val parts1 = (0 until 2).map(p => PartitionState("t", p, 0L, 10L))
    val run1 = OffsetLifecycle.planRun(store, parts1, broker(10), "part", "off")
    assert(run1.data.count() == 20)
    run1.commitOffsets(store, "r1")
    assert(OffsetLifecycle.committedOffsets(store, Set("t")) ==
      Map(("t", 0) -> 10L, ("t", 1) -> 10L))

    // run 2: nothing new — plans zero ranges, PRESERVES the watermark
    val run2 = OffsetLifecycle.planRun(store, parts1, broker(10), "part", "off")
    assert(run2.ranges.isEmpty && run2.data.count() == 0)
    run2.commitOffsets(store, "r2")
    assert(OffsetLifecycle.committedOffsets(store, Set("t")) ==
      Map(("t", 0) -> 10L, ("t", 1) -> 10L))

    // run 3: new data landed [10, 15) — resumes from committed, delta only
    val parts3 = (0 until 2).map(p => PartitionState("t", p, 0L, 15L))
    val run3 = OffsetLifecycle.planRun(store, parts3, broker(15), "part", "off")
    val offs = run3.data.select("off").as[Long].collect()
    assert(offs.length == 10 && offs.forall(o => o >= 10 && o < 15))
    run3.commitOffsets(store, "r3")

    // union of the three runs covers the log exactly once
    val all = run1.data.union(run2.data).union(run3.data)
    assert(all.count() == 30 && all.distinct().count() == 30)
  }

  test("reset-after-retention: expired commit restarts per policy") {
    val store = new StateStore(spark, tmpDir("offsets-reset"))
    val parts = Seq(PartitionState("t", 0, 0L, 10L))
    OffsetLifecycle.planRun(store, parts, broker(10), "part", "off")
      .commitOffsets(store, "r1")

    // broker truncated past the commit: retained range is now [20, 25)
    val truncated = Seq(PartitionState("t", 0, 20L, 25L))
    val data = (0 until 1).flatMap(p => (20L until 25L).map(o => (p, o, "m")))
      .toDF("part", "off", "payload")

    val earliest = OffsetLifecycle.planRun(store, truncated, data, "part", "off",
      reset = ResetEarliest)
    assert(earliest.ranges == Seq(OffsetRange("t", 0, 20L, 25L)))
    assert(earliest.data.count() == 5)

    val latest = OffsetLifecycle.planRun(store, truncated, data, "part", "off",
      reset = ResetLatest)
    assert(latest.ranges.isEmpty && latest.data.count() == 0)
  }

  test("bounded units split a large resume without gaps or overlap") {
    val store = new StateStore(spark, tmpDir("offsets-split"))
    val parts = Seq(PartitionState("t", 0, 0L, 100L))
    val run = OffsetLifecycle.planRun(store, parts, broker(100), "part", "off",
      maxRecordsPerUnit = 30L)
    assert(run.ranges.map(r => (r.start, r.end)) ==
      Seq((0L, 30L), (30L, 60L), (60L, 90L), (90L, 100L)))
    run.commitOffsets(store, "r1")
    assert(OffsetLifecycle.committedOffsets(store, Set("t"))(("t", 0)) == 100L)
  }
}
