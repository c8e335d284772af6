package graft.planning

import org.apache.spark.sql.DataFrame

import graft.planning.OffsetRangePlanner._
import graft.state.StateStore

/** The Kafka ingestion LIFECYCLE: plan ranges from the previous run's
  * committed offsets, extract, publish, commit the new offsets — then the
  * next run resumes from exactly the committed frontier.
  *
  * Reference: KafkaSource.getWorkunits reads the previous run's
  * WorkUnitStates to seed each partition's start offset
  * (KafkaSource.java:198,213), falls back to the reset policy when the
  * commit is outside the retained range (KafkaSource.java:544), and the
  * job commits the new MultiLongWatermark per partition only after
  * publish. A partition with NO new records keeps its previous watermark
  * (the empty-work-unit rule, QueryBasedSource.java:195-199) — here that
  * falls out of the state store's upsert: no range planned → no entry
  * overwritten.
  *
  * The extraction face is the file-replay stand-in ([[OffsetRangePlanner
  * .extract]]); a real `format("kafka")` source would feed the same
  * planner from broker metadata — the lifecycle (this file) is identical.
  */
object OffsetLifecycle {

  /** Previously-committed offsets for the given topics, read from the
    * state store (dataset = topic, partition = partition number). */
  def committedOffsets(store: StateStore,
                       topics: Set[String]): Map[(String, Int), Long] =
    store.read().collect {
      case ((topic, part), off) if topics.contains(topic) =>
        (topic, part.toInt) -> off.toLong
    }

  /** Planned ranges plus the extracted delta; [[commitOffsets]] AFTER the
    * output is durably published — the reference's job-commit ordering. A
    * crash before the commit replays the same ranges next run; replay into
    * an atomic publish (AtomicPublisher / SnapshotLog) is effectively-once. */
  final case class PlannedRun(ranges: Seq[OffsetRange], data: DataFrame) {
    def commitOffsets(store: StateStore, runId: String): Unit =
      store.commit(
        nextCommits(ranges).map { case ((t, p), off) =>
          (t, p.toString) -> off.toString },
        runId)
  }

  /** One lifecycle turn: read committed offsets, plan, extract. */
  def planRun(store: StateStore, partitions: Seq[PartitionState],
              df: DataFrame, partitionCol: String, offsetCol: String,
              reset: ResetPolicy = ResetEarliest,
              maxRecordsPerUnit: Long = Long.MaxValue,
              topicPattern: Option[String] = None): PlannedRun = {
    val committed = committedOffsets(store, partitions.map(_.topic).toSet)
    val ranges = plan(partitions, committed, reset, maxRecordsPerUnit, topicPattern)
    PlannedRun(ranges, extract(df, ranges, partitionCol, offsetCol))
  }
}
