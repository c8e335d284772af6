package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD-2) history from a CDC changelog: turn
  * (key, change_ts, payload) rows into (key, payload, valid_from,
  * valid_to) validity intervals — `valid_to` NULL on each key's open
  * current version.
  *
  * Reference: the reference's database-ingestion jobs land changelogs
  * (QueryBasedSource append/snapshot extracts) and compact them to
  * latest-per-key (RecordKeyDedupReducerBase.java:74 — our
  * [[Dedup.keyDeltaTop1]], q06); the SCD-2 face keeps EVERY version with
  * its validity window instead, which is what point-in-time joins
  * consume — [[graft.streaming.Streams.asOfEnrich]] builds exactly this
  * timeline inline for the streaming case, and [[TemporalJoin.asOf]] is
  * its batch dual.
  *
  * Scale shape: one `lead` window per key — a single hash shuffle on the
  * key columns, no joins. Same-(key, ts) duplicates make a history
  * ill-defined, so they are collapsed FIRST when `delta` orderings are
  * given ([[Dedup.keyDeltaTop1]] on key+ts — deterministic survivor);
  * with `delta` empty the changelog is trusted unique (the asOfEnrich
  * contract), and the dedup's extra shuffle is not paid.
  */
object Scd {

  /** The history table: every changelog version with `[valid_from,
    * valid_to)` bounds; `valid_to` is NULL on the open current version. */
  def scd2(changelog: DataFrame, keyCols: Seq[String], tsCol: String,
           delta: Seq[Column] = Seq.empty,
           validFrom: String = "valid_from",
           validTo: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val clash = Set(validFrom, validTo) intersect changelog.columns.toSet
    require(clash.isEmpty,
      s"changelog already has interval columns: $clash — rename them")
    val base =
      if (delta.isEmpty) changelog
      else changelog.transform(Dedup.keyDeltaTop1(keyCols :+ tsCol, delta))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    base.withColumn(validFrom, col(tsCol))
      .withColumn(validTo, lead(col(tsCol), 1).over(w))
  }

  /** The current snapshot: each key's open version (the latest-per-key
    * compaction, derived from the history instead of recomputed). */
  def current(history: DataFrame, validTo: String = "valid_to"): DataFrame =
    history.filter(col(validTo).isNull)

  /** Point-in-time read: the version of each key valid AT `ts` —
    * `valid_from <= ts < valid_to` (open version catches everything
    * since its start). A map-only filter over the history: time travel
    * on a dimension without a snapshot store, because the validity
    * intervals ARE the version index. Keys first seen after `ts`
    * simply have no row. */
  def asOf(history: DataFrame, ts: Column,
           validFrom: String = "valid_from",
           validTo: String = "valid_to"): DataFrame =
    history.filter(col(validFrom) <= ts &&
      (col(validTo).isNull || ts < col(validTo)))
}
