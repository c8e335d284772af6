package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.planning.OffsetRangePlanner
import graft.planning.OffsetRangePlanner.{OffsetRange, PartitionState}

/** The planner→connector seam: planned ranges must serialize to exactly
  * the `startingOffsets`/`endingOffsets` JSON Spark's Kafka source
  * accepts, and round-trip back losslessly. No broker or connector jar
  * exists in this sandbox, so this layer is the whole testable surface —
  * when the jar is present, readBatch/readStream are one config away. */
class KafkaConnectorSpec extends AnyFunSuite {

  private val parts = Seq(
    PartitionState("logs", 0, earliest = 100, latest = 500),
    PartitionState("logs", 1, earliest = 0, latest = 250),
    PartitionState("clicks", 0, earliest = 10, latest = 90))

  test("planner ranges -> startingOffsets JSON -> parse round-trips") {
    val ranges = OffsetRangePlanner.plan(parts,
      committed = Map(("logs", 0) -> 300L, ("clicks", 0) -> 10L))
    val json = KafkaConnector.startingOffsetsJson(ranges)
    assert(KafkaConnector.parseOffsetsJson(json) ==
      Map(("logs", 0) -> 300L, ("logs", 1) -> 0L, ("clicks", 0) -> 10L))
  }

  test("endingOffsets equals the planner's nextCommits (split units merge)") {
    // maxRecordsPerUnit splits logs-0 into [300,400)+[400,500); the JSON
    // must carry the merged end per partition, not one entry per unit
    val ranges = OffsetRangePlanner.plan(parts,
      committed = Map(("logs", 0) -> 300L), maxRecordsPerUnit = 100)
    val json = KafkaConnector.endingOffsetsJson(ranges)
    assert(KafkaConnector.parseOffsetsJson(json) ==
      Map(("logs", 0) -> 500L, ("logs", 1) -> 250L, ("clicks", 0) -> 90L))
  }

  test("JSON shape matches the connector's documented format, keys sorted") {
    val ranges = Seq(
      OffsetRange("b_topic", 1, 7, 20), OffsetRange("b_topic", 0, 3, 11),
      OffsetRange("a_topic", 0, KafkaConnector.Earliest, 5))
    assert(KafkaConnector.startingOffsetsJson(ranges) ==
      """{"a_topic":{"0":-2},"b_topic":{"0":3,"1":7}}""")
  }

  test("batch options bound both ends; streaming options tail the log") {
    val ranges = OffsetRangePlanner.plan(parts, committed = Map.empty)
    val batch = KafkaConnector.options("broker:9092", ranges)
    assert(batch("subscribe") == "clicks,logs")
    assert(batch("kafka.bootstrap.servers") == "broker:9092")
    assert(batch.contains("startingOffsets") && batch.contains("endingOffsets"))
    val stream = KafkaConnector.options("broker:9092", ranges, streaming = true)
    assert(!stream.contains("endingOffsets"))
  }

  test("sandbox has no connector jar: read paths refuse loudly, not lazily") {
    val ranges = Seq(OffsetRange("t", 0, 0, 10))
    if (!KafkaConnector.isAvailable) {
      val e = intercept[IllegalStateException] {
        KafkaConnector.readBatch(graft.SparkSpec.session, "broker:9092", ranges)
      }
      assert(e.getMessage.contains("spark-sql-kafka"))
    } else {
      // jar present (future environment): constructing the frame must work
      assert(KafkaConnector.readBatch(
        graft.SparkSpec.session, "broker:9092", ranges).columns.contains("value"))
    }
  }

  test("malformed offsets JSON fails with a diagnostic, not a MatchError") {
    val e = intercept[IllegalArgumentException] {
      KafkaConnector.parseOffsetsJson("""{"t":{"0":"not-a-number"}}""")
    }
    assert(e.getMessage.contains("not a number"))
  }
}
