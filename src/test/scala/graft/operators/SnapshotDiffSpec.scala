package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, Option[String], Double)*) =
    rows.toSeq.toDF("k", "s", "v")

  test("emits I, U, D and nothing for unchanged rows") {
    val oldS = mk((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, Some("c"), 3.0))
    val newS = mk((1L, Some("a"), 1.0), // unchanged
      (2L, Some("B"), 2.0), // updated
      (4L, Some("d"), 4.0)) // inserted; 3 deleted
    val got = SnapshotDiff.rowDiff(oldS, newS, Seq("k"))
      .select("k", "op", "s", "v")
      .as[(Long, String, Option[String], Double)].collect().toSet
    assert(got == Set(
      (2L, "U", Some("B"), 2.0),
      (3L, "D", Some("c"), 3.0),
      (4L, "I", Some("d"), 4.0)))
  }

  test("null payload transitions are updates, not silent equals") {
    val oldS = mk((1L, Some("a"), 1.0), (2L, None, 2.0))
    val newS = mk((1L, None, 1.0), (2L, None, 2.0))
    val got = SnapshotDiff.rowDiff(oldS, newS, Seq("k"))
      .select("k", "op").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "U")))
  }

  test("applying the diff as a MERGE reproduces the new snapshot") {
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    val newSnap = ev.filter(col("event_id") % 11 =!= 0)
      .withColumn("value", when(col("event_id") % 5 === 0,
        col("value") + 100).otherwise(col("value")))
    val diff = SnapshotDiff.rowDiff(ev, newSnap, Seq("event_id"))
    // round-trip: old + changelog == new (Merge.merged applies I/U/D)
    val applied = Merge.merged(ev, diff,
      Seq("event_id"), deleteWhen = col("op") === "D")
    assert(applied.exceptAll(newSnap).isEmpty &&
      newSnap.exceptAll(applied).isEmpty)
    // and unchanged keys are absent from the changelog
    val unchanged = ev.filter(col("event_id") % 11 =!= 0 &&
      col("event_id") % 5 =!= 0).select("event_id")
    assert(diff.join(unchanged, Seq("event_id"), "left_semi").isEmpty)
  }

  test("mismatched schemas are refused") {
    val oldS = mk((1L, Some("a"), 1.0))
    intercept[IllegalArgumentException] {
      SnapshotDiff.rowDiff(oldS, oldS.withColumnRenamed("v", "w"), Seq("k"))
    }
  }
}
