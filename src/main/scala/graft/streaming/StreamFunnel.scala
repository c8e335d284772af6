package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.operators.Funnel]]: per-user ordered-stage
  * certification as keyed state, so "how far has each user got" is
  * continuously current instead of a nightly batch window job.
  *
  * State per key is O(stages) — one earliest-certified timestamp per
  * stage, monotone under the same recursion as the batch operator
  * (stage k certifies at ts only if stage k-1 was certified at or
  * before ts), so replaying a user's events sequentially reproduces
  * the batch window computation exactly.
  *
  * Contract: a key's events must arrive in event-time order ACROSS
  * micro-batches (within a batch they are sorted here by (ts, tie));
  * disordered history is the batch operator's job — the same
  * order-vs-watermark contract every streaming operator in this
  * engine documents. State is per-user and never expires (a funnel
  * spans the user's lifetime); cap the key domain upstream if users
  * are unbounded.
  */
object StreamFunnel {

  /** reach(k) = earliest certified stage-k event time (micros), -1 when
    * uncertified. depth = count of certified stages (a prefix by
    * construction). */
  final case class FunnelState(reach: Seq[Long])
  final case class FunnelDepth(key: String, depth: Int)

  /** Continuous per-user funnel depth; each micro-batch emits the
    * current depth of every key that received events (Update mode). */
  def depths(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             tieCol: String): Dataset[FunnelDepth] = {
    require(stages.nonEmpty && stages.distinct == stages)
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val n = stages.length
    events
      .select(col(keyCol).cast("string").as("k"),
        col(tsCol).cast("timestamp").as("ts"),
        col(typeCol).cast("string").as("ty"),
        col(tieCol).cast("long").as("tie"))
      .as[(String, java.sql.Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelDepth](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[FunnelState]) =>
          val reach = state.getOption
            .map(_.reach.toArray).getOrElse(Array.fill(n)(-1L))
          // FULL microsecond precision: getTime truncates to millis,
          // which would reorder sub-ms ties differently from the batch
          // operator's timestamp comparison
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          // within-batch disorder is fine: sort by (ts, tie); across
          // batches the arrival-order contract applies
          val evs = it.toArray.sortBy(e => (micros(e._2), e._4))
          evs.foreach { case (_, tsv, ty, _) =>
            stageIdx.get(ty).foreach { k =>
              val t = micros(tsv)
              val certified =
                if (k == 0) true
                else reach(k - 1) >= 0L && t >= reach(k - 1)
              if (certified && (reach(k) < 0L || t < reach(k)))
                reach(k) = t
            }
          }
          state.update(FunnelState(reach.toSeq))
          Iterator(FunnelDepth(key, reach.takeWhile(_ >= 0L).length))
      }
  }
}
