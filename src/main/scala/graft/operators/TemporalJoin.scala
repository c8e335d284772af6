package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's optimizer has no native operator for: as-of
  * (point-in-time) lookup and point-in-interval range join.
  *
  * Written naively, both degenerate at scale: an as-of as a theta-join
  * (`l.ts >= r.ts` + window to pick the max) re-materializes every
  * (left, right-history) pair before pruning, and a range join without
  * an equality key falls to BroadcastNestedLoopJoin — O(points ×
  * intervals) at 100 TB. The shapes here are the standard scale
  * rewrites (same family as the reference's time-partitioned lookups,
  * e.g. gobblin-data-management/.../version/finder/DateTimeDatasetVersionFinder.java
  * resolving "the version current at T"):
  *
  *   - [[asOf]]: union-tag both sides, hash-partition by key, ONE sort
  *     by (ts, side), forward-fill the latest right payload — one
  *     shuffle, no join node at all. Cost is a sort per key partition,
  *     identical to any keyed window.
  *   - [[pointInRange]]: quantize intervals into fixed-width bins
  *     (each interval explodes into the bins it covers; each point maps
  *     to exactly one bin), hash-join on the bin, post-filter exact
  *     containment. The nested loop becomes a hash join whose fan-out
  *     is (interval width / bin width), chosen by the caller.
  */
object TemporalJoin {

  /** As-of (point-in-time) join: each `left` row picks up the payload of
    * the latest `right` row with `right.tsCol <= left.tsCol` for the same
    * key (inclusive — a right row at exactly left's ts matches). Left
    * rows before their key's first right row get null payload (left-outer
    * semantics). Output = all left columns ++ all right non-key columns
    * (including `rightTsCol`, so callers can compute staleness).
    *
    * The right payload travels as ONE struct, so multi-column payloads
    * always come from the same right row even when individual payload
    * values are null. Right rows that share an exact (key, ts) make the
    * survivor order-dependent — pre-dedup the right side (as the q95
    * query does) when the source can produce them.
    *
    * Note: null keys group together (window-partition semantics), unlike
    * a SQL equality join where null never matches — filter them out first
    * if SQL semantics are needed. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTsCol: String, rightTsCol: String): DataFrame = {
    val payload = right.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(rightTsCol),
      s"rightTsCol $rightTsCol must be a non-key column of right")
    val clash = payload.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left: $clash — rename first")
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val pay = "__graft_asof_payload"
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    // exact-ts right row is visible to that left row (inclusive match)
    val rNorm = right.select(
      keyCols.map(col) :+ col(rightTsCol).as(ts) :+
        struct(payload.map(col): _*).as(pay): _*)
      .withColumn(side, lit(0))
    val lNorm = left
      .withColumn(ts, col(leftTsCol))
      .withColumn(side, lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm, allowMissingColumns = true)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"$pay.$p").as(p)): _*)
  }

  /** Forward as-of: each left row picks up the EARLIEST right row with
    * `right.tsCol >= left.tsCol` (inclusive) for its key — "the next
    * observation at or after T" (next maintenance window, next price
    * tick), the mirror of [[asOf]]'s "latest at or before T". Same
    * single-shuffle shape: union-tag, one sort, BACKWARD fill (`first`
    * over the following frame); left rows after their key's last right
    * row get null payload. Right rows sort AFTER left at equal ts and
    * the frame starts at the current row, so an exact-ts right row is
    * matched (inclusive). Same null-key and duplicate-(key, ts) caveats
    * as [[asOf]]. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTsCol: String, rightTsCol: String): DataFrame = {
    val payload = right.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(rightTsCol),
      s"rightTsCol $rightTsCol must be a non-key column of right")
    val clash = payload.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left: $clash — rename first")
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val pay = "__graft_asof_payload"
    // left rows sort BEFORE right rows at equal ts (side 0 < 1) so the
    // [current, following] frame still sees an exact-ts right row
    val rNorm = right.select(
      keyCols.map(col) :+ col(rightTsCol).as(ts) :+
        struct(payload.map(col): _*).as(pay): _*)
      .withColumn(side, lit(1))
    val lNorm = left
      .withColumn(ts, col(leftTsCol))
      .withColumn(side, lit(0))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lNorm.unionByName(rNorm, allowMissingColumns = true)
      .withColumn(pay, first(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 0)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"$pay.$p").as(p)): _*)
  }

  /** Nearest as-of: each left row picks up whichever right row is
    * CLOSER in time — the latest at-or-before or the earliest
    * at-or-after — with ties (equidistant, including exact-ts dist 0)
    * going to the backward candidate. Sensor alignment / nearest-tick
    * semantics. STILL one shuffle and ONE sort: both directional fills
    * are window frames over the same (ts, side) order, and the
    * distance arbitration is a row-local struct comparison. */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTsCol: String, rightTsCol: String): DataFrame = {
    val payload = right.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(rightTsCol),
      s"rightTsCol $rightTsCol must be a non-key column of right")
    val clash = payload.toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left: $clash — rename first")
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val pay = "__graft_asof_payload"
    // right before left at equal ts: the backward frame sees exact-ts
    // rows (dist 0), which win every tie anyway
    val rNorm = right.select(
      keyCols.map(col) :+ col(rightTsCol).as(ts) :+
        struct(payload.map(col): _*).as(pay): _*)
      .withColumn(side, lit(0))
    val lNorm = left
      .withColumn(ts, col(leftTsCol))
      .withColumn(side, lit(1))
    val order = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts), col(side))
    val wBack = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = "__graft_asof_back"
    val fwd = "__graft_asof_fwd"
    val distBack = unix_micros(col(ts)) - unix_micros(col(s"$back.$rightTsCol"))
    val distFwd = unix_micros(col(s"$fwd.$rightTsCol")) - unix_micros(col(ts))
    lNorm.unionByName(rNorm, allowMissingColumns = true)
      .withColumn(back, last(col(pay), ignoreNulls = true).over(wBack))
      .withColumn(fwd, first(col(pay), ignoreNulls = true).over(wFwd))
      .filter(col(side) === 1)
      .withColumn(pay,
        when(col(back).isNull, col(fwd))
          .when(col(fwd).isNull, col(back))
          .when(distFwd < distBack, col(fwd))
          .otherwise(col(back)))
      .select(left.columns.map(col) ++
        payload.map(p => col(s"$pay.$p").as(p)): _*)
  }

  /** Point-in-interval range join: `points` rows paired with every
    * `intervals` row whose [startCol, endCol) contains `pTsCol`
    * (half-open; both timestamps). No equality key needed — the bin is
    * the synthetic one. Output = points columns ++ intervals columns.
    *
    * `binSeconds` trades replication for candidate precision: each
    * interval is exploded into ceil(width / bin) bucket rows, each point
    * hashes to exactly one bucket (so no post-join dedup), and the exact
    * containment filter runs only within a bucket. Size the bin near the
    * typical interval width. `maxBinsPerInterval` fails loudly if a
    * runaway interval (a years-wide window against a 1 s bin) would
    * explode the build side. */
  def pointInRange(points: DataFrame, pTsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   binSeconds: Long,
                   maxBinsPerInterval: Int = 100000): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val clash = intervals.columns.toSet intersect points.columns.toSet
    require(clash.isEmpty,
      s"interval columns collide with point columns: $clash — rename first")
    val binUs = binSeconds * 1000000L
    val bin = "__graft_range_bin"
    def binOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / lit(binUs))
    val lastBin = binOf(col(endCol) - expr("INTERVAL 1 MICROSECOND"))
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty/inverted: no point fits
      .withColumn(bin, explode(sequence(
        // guard BEFORE exploding: a silent runaway here is an OOM at scale
        when(lastBin - binOf(col(startCol)) >= maxBinsPerInterval,
          raise_error(concat(lit(s"pointInRange: interval wider than " +
            s"$maxBinsPerInterval bins of ${binSeconds}s starting at "),
            col(startCol).cast("string"))))
          .otherwise(binOf(col(startCol))),
        lastBin)))
    points.withColumn(bin, binOf(col(pTsCol)))
      .join(iv, Seq(bin))
      .filter(col(pTsCol) >= col(startCol) && col(pTsCol) < col(endCol))
      .drop(bin)
  }
}
