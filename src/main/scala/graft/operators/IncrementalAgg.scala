package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (materialized-view) aggregate maintenance: keep a keyed
  * aggregate table current by folding in each new batch's PARTIAL
  * aggregate instead of re-scanning history — merge(state(A), state(B))
  * == state(A ∪ B) for the algebraic aggregates (count/sum/min/max,
  * with avg derived at read time from sum and count).
  *
  * Reference: the reference maintains run-over-run totals by re-reading
  * or by external stores (audit counters, job-history aggregation);
  * its incremental PULL is watermark-based extraction
  * ([[graft.planning.WatermarkPartitioner]]) — this operator is the
  * matching incremental FOLD on the result side, so a 100 TB corpus'
  * daily metrics cost O(day), not O(corpus).
  *
  * Scale shape: each batch is reduced by one map-side-combined shuffle
  * to keys × aggregates; the merge then unions two ALREADY-REDUCED
  * frames and combines per key — its cost is O(|state|), independent
  * of how much raw history the state summarizes. Only algebraic
  * aggregates are accepted; a holistic aggregate (median, distinct
  * count) has no mergeable partial and must be re-derived or
  * sketch-approximated ([[Quality.approxCompleteness]]'s HLL face).
  */
object IncrementalAgg {

  /** One maintained aggregate: `agg` reduces raw rows, `merge` combines
    * two partials of the SAME column. */
  final case class AggSpec(out: String, agg: Column, merge: Column => Column)

  object AggSpec {
    def count(out: String): AggSpec =
      AggSpec(out, functions.count(lit(1)), functions.sum(_))
    def sum(out: String, c: Column): AggSpec =
      AggSpec(out, functions.sum(c), functions.sum(_))
    def min(out: String, c: Column): AggSpec =
      AggSpec(out, functions.min(c), functions.min(_))
    def max(out: String, c: Column): AggSpec =
      AggSpec(out, functions.max(c), functions.max(_))
  }

  // qualified alias so AggSpec constructors can shadow the names
  private val functions = org.apache.spark.sql.functions

  /** The partial-aggregate state of one batch: keys + one column per
    * spec. This is also the bootstrap: state of the full history. */
  def state(df: DataFrame, keyCols: Seq[String],
            specs: Seq[AggSpec]): DataFrame = {
    require(keyCols.nonEmpty && specs.nonEmpty)
    val aggs = specs.map(s => s.agg.as(s.out))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold any number of partial states into one:
    * merge(state(A), state(B)) == state(A ∪ B). Keys absent from one
    * side pass through; the merge functions never see invented nulls
    * because union'd frames only contribute rows they actually have. */
  def merge(states: Seq[DataFrame], keyCols: Seq[String],
            specs: Seq[AggSpec]): DataFrame = {
    require(states.nonEmpty)
    val unioned = states.reduce(_ unionByName _)
    val aggs = specs.map(s => s.merge(col(s.out)).as(s.out))
    unioned.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Derive a COARSER aggregate from an already-reduced state: re-key
    * the state (e.g. hour bucket → its day) and combine with the merge
    * functions — `rollup(state(df, hour), day) == state(df, day)`
    * because the merge functions are associative over any regrouping.
    * This is the rollup-tree maintenance trick: daily totals cost
    * O(hours), monthly cost O(days) — the raw table is read exactly
    * once, by the finest grain. `rekey` maps state columns to the new
    * key columns (e.g. `"day" -> date_trunc("day", col("bucket"))`). */
  def rollup(state: DataFrame, rekey: Seq[(String, Column)],
             carryKeys: Seq[String], specs: Seq[AggSpec]): DataFrame = {
    require(rekey.nonEmpty)
    val rekeyed = rekey.foldLeft(state) { case (d, (name, c)) =>
      d.withColumn(name, c) }
    merge(Seq(rekeyed), rekey.map(_._1) ++ carryKeys, specs)
  }
}
