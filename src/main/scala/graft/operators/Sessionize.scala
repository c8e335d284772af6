package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: a session closes when its key goes
  * quiet for longer than `gap`. Same semantics as the streaming face
  * ([[graft.streaming.Streams.sessionize]], flatMapGroupsWithState) so a
  * backfill and the live stream produce identical sessions — the
  * batch/stream parity the reference's ExecutionModel promises for its
  * task flows (gobblin-runtime/.../ExecutionModel.java) extended to
  * session windows.
  *
  * Plan: ONE shuffle on the key; the lag + running-sum window and the
  * final per-session aggregation reuse that partitioning (no second
  * exchange). Per-key event lists never materialize — state is the
  * window's running frame. Skewed keys (one user with millions of
  * events) serialize within their partition, same as any keyed window.
  */
object Sessionize {

  /** Sessions as (key, session_seq, session_start, session_end, n_events);
    * session_seq numbers a key's sessions in time order from 1. */
  def gapSessions(df: DataFrame, keyCol: String, tsCol: String,
                  gap: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byKey)
    // events within `gap` of the previous event chain into one session;
    // ties on ts are order-insensitive (diff 0 never opens a session)
    val opens = when(prev.isNull ||
      col(tsCol) > prev + expr(s"INTERVAL $gap"), 1L).otherwise(0L)
    df.withColumn("__opens", opens)
      .withColumn("session_seq", sum(col("__opens")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Derived per-session metrics commonly fed to downstream joins. */
  def withDuration(sessions: DataFrame): DataFrame =
    sessions.withColumn("duration_sec",
      unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
}
