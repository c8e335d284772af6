package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomIndexedSourceSpec extends SparkSpec {
  import spark.implicits._

  test("point probe equals plain filter and prunes files") {
    val ev = Tables.load(spark, sf, "events")
    val dir = tmpDir("bloom") + "/events"
    BloomIndexedSource.writeWithBloom(ev, dir, "event_id", "ts",
      numFiles = 16)
    val probes = Seq(3L, 500L, 998L)
    val (frame, kept, total) =
      BloomIndexedSource.readPoints(spark, dir, "event_id", probes)
    assert(frame.select("event_id").as[Long].collect().sorted.toSeq ==
      ev.filter(col("event_id").isin(probes: _*))
        .select("event_id").as[Long].collect().sorted.toSeq)
    assert(total == 16)
    assert(kept < total, s"bloom must prune: kept $kept of $total")
  }

  test("no false negatives: every probed existing key is found") {
    val ev = Tables.load(spark, sf, "events")
    val dir = tmpDir("bloom-fn") + "/events"
    BloomIndexedSource.writeWithBloom(ev, dir, "event_id", "ts",
      numFiles = 8)
    // probe EVERY 50th id — all must come back regardless of fpp
    val probes = (0L until 1000L by 50L).toSeq
    val (frame, _, _) =
      BloomIndexedSource.readPoints(spark, dir, "event_id", probes)
    assert(frame.count() == ev.filter(col("event_id").isin(probes: _*)).count())
  }

  test("probing absent keys reads (almost) nothing and returns zero rows") {
    val ev = Tables.load(spark, sf, "events")
    val dir = tmpDir("bloom-absent") + "/events"
    BloomIndexedSource.writeWithBloom(ev, dir, "event_id", "ts",
      numFiles = 8)
    val (frame, kept, total) = BloomIndexedSource.readPoints(
      spark, dir, "event_id", Seq(123456789L))
    assert(frame.count() == 0)
    // false positives allowed but bounded: nothing forces any file open
    assert(kept <= total)
  }
}
