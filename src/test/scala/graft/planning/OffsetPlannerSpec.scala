package graft.planning

import graft.SparkSpec
import graft.planning.OffsetRangePlanner._

class OffsetPlannerSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq(
    PartitionState("t", 0, earliest = 0, latest = 100),
    PartitionState("t", 1, earliest = 40, latest = 100),
    PartitionState("u", 0, earliest = 0, latest = 10))

  test("resume from committed, first-run from earliest") {
    val r = plan(parts, Map(("t", 0) -> 60L))
    assert(r.toSet == Set(
      OffsetRange("t", 0, 60, 100),
      OffsetRange("t", 1, 40, 100), // no commit -> earliest
      OffsetRange("u", 0, 0, 10)))
  }

  test("out-of-range commits reset by policy") {
    // committed below retention (expired) and above latest (recreated)
    val committed = Map(("t", 1) -> 10L, ("u", 0) -> 50L)
    val earliest = plan(parts, committed, ResetEarliest)
    assert(earliest.contains(OffsetRange("t", 1, 40, 100)))
    assert(earliest.contains(OffsetRange("u", 0, 0, 10)))
    val latest = plan(parts, committed, ResetLatest)
    // skip-to-head produces empty ranges for the out-of-range partitions
    assert(!latest.exists(_.topic == "u"))
    assert(!latest.exists(r => r.topic == "t" && r.partition == 1))
  }

  test("maxRecordsPerUnit splits ranges; topic filter prunes") {
    val r = plan(parts.take(1), Map.empty, maxRecordsPerUnit = 30)
    assert(r == Seq(
      OffsetRange("t", 0, 0, 30), OffsetRange("t", 0, 30, 60),
      OffsetRange("t", 0, 60, 90), OffsetRange("t", 0, 90, 100)))
    assert(plan(parts, Map.empty, topicPattern = Some("u")).forall(_.topic == "u"))
  }

  test("extract applies ranges; nextCommits advances per partition") {
    val df = (0L until 50L).map(i => (i % 2, i / 2)).toDF("part", "off")
    val ranges = Seq(OffsetRange("t", 0, 5, 10), OffsetRange("t", 1, 20, 25))
    val got = extract(df, ranges, "part", "off")
    assert(got.count() == 10)
    assert(extract(df, Nil, "part", "off").count() == 0)
    assert(nextCommits(ranges ++ Seq(OffsetRange("t", 0, 10, 15))) ==
      Map(("t", 0) -> 15L, ("t", 1) -> 25L))
  }
}
