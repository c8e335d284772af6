package graft.planning

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offset-range work-unit planning with Kafka-shaped semantics: one unit
  * per (topic, partition) covering [start, latest), where start is the
  * previously-committed offset bounded by the partition's retained range.
  *
  * Reference: KafkaSource
  * (gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:
  * 198,213,544) — discover partitions, fetch earliest/latest, compare the
  * previous run's committed offset, handle out-of-range commits via a
  * reset policy, filter topics, and split large ranges into bounded work
  * units (the packer's size estimation, KafkaWorkUnitPacker.java:58,
  * collapses to a simple max-records split here because Spark's scheduler
  * does the bin packing).
  *
  * No Kafka broker exists in this sandbox; the extraction face is
  * [[extract]], which applies the planned ranges to any DataFrame carrying
  * (partition, offset) columns — the file-replay stand-in — while a real
  * broker would feed the same planner from its admin API.
  */
object OffsetRangePlanner {

  /** Broker-side view of one partition: retained offsets [earliest, latest). */
  final case class PartitionState(topic: String, partition: Int,
                                  earliest: Long, latest: Long)

  /** One planned unit: offsets [start, end). */
  final case class OffsetRange(topic: String, partition: Int,
                               start: Long, end: Long)

  /** What to do when the committed offset fell outside the retained
    * range (KafkaSource's out-of-range handling). */
  sealed trait ResetPolicy
  case object ResetEarliest extends ResetPolicy // reprocess what remains
  case object ResetLatest extends ResetPolicy   // skip to the head

  def plan(partitions: Seq[PartitionState],
           committed: Map[(String, Int), Long],
           reset: ResetPolicy = ResetEarliest,
           maxRecordsPerUnit: Long = Long.MaxValue,
           topicPattern: Option[String] = None): Seq[OffsetRange] = {
    require(maxRecordsPerUnit > 0)
    val kept = topicPattern.fold(partitions)(p =>
      partitions.filter(_.topic.matches(p)))
    kept.flatMap { ps =>
      val c = committed.get((ps.topic, ps.partition))
      val start = c match {
        case Some(off) if off >= ps.earliest && off <= ps.latest => off
        case Some(_) => reset match { // out of range: expired or recreated
          case ResetEarliest => ps.earliest
          case ResetLatest   => ps.latest
        }
        case None => ps.earliest // first run consumes the retained log
      }
      // split into bounded units (work-unit sizing); remaining-based hi
      // avoids lo + maxRecordsPerUnit overflowing for unbounded units
      val units = scala.collection.mutable.ListBuffer.empty[OffsetRange]
      var lo = start
      while (lo < ps.latest) {
        val hi = if (ps.latest - lo > maxRecordsPerUnit) lo + maxRecordsPerUnit
                 else ps.latest
        units += OffsetRange(ps.topic, ps.partition, lo, hi)
        lo = hi
      }
      units.toSeq
    }
  }

  /** Apply planned ranges to a DataFrame with (partition, offset) columns
    * — one OR-of-ranges predicate, pushed into the scan. */
  def extract(df: DataFrame, ranges: Seq[OffsetRange],
              partitionCol: String, offsetCol: String): DataFrame = {
    val preds: Seq[Column] = ranges.map(r =>
      col(partitionCol) === r.partition &&
        col(offsetCol) >= r.start && col(offsetCol) < r.end)
    preds.reduceOption(_ || _) match {
      case Some(p) => df.filter(p)
      case None    => df.limit(0)
    }
  }

  /** Commit face: highest end per (topic, partition) becomes the next
    * run's committed offset (MultiLongWatermark semantics — one long per
    * partition, gobblin-kafka-common/.../MultiLongWatermark.java). */
  def nextCommits(ranges: Seq[OffsetRange]): Map[(String, Int), Long] =
    ranges.groupBy(r => (r.topic, r.partition))
      .map { case (k, rs) => k -> rs.map(_.end).max }
}
