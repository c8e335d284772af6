package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Row-level change-data capture between two snapshots of a keyed
  * table: emit exactly the changelog that turns `oldDf` into `newDf` —
  * `I` for keys only in new, `D` for keys only in old, `U` for keys in
  * both whose payload differs. Unchanged keys emit NOTHING, which is
  * the whole point: the diff is the increment.
  *
  * This is the inverse of [[Merge.mergePartitioned]] (which APPLIES a
  * changelog) and the row-level face of the file-delta replication
  * ([[graft.sinks.SnapshotReplicate]] copies changed FILES; this
  * derives changed ROWS for consumers that want semantics, not
  * bytes — e.g. feeding [[Scd.history]] or a downstream stream).
  * Reference: the reference's distcp diff plans file copies from
  * modtime/length deltas (CopyableFile comparisons) and its
  * compaction detects late data by partition — neither produces a
  * row-level delta; this operator closes that gap.
  *
  * Scale shape: ONE full-outer sort-merge join on the key, each side
  * reduced to (key, payload-struct) first — payload comparison is one
  * struct equality, no per-column join conditions. No broadcast
  * assumption: both snapshots may be huge. Keys must be unique per
  * side (it is a diff of SNAPSHOTS, not logs) — dedup first
  * ([[Dedup.keyDeltaTop1]]) if they are not.
  */
object SnapshotDiff {

  /** The changelog from `oldDf` to `newDf`: keyCols ++ (op, payload
    * columns) where payload is every non-key column of `newDf` (old
    * payload for `D` rows). Ops: I=insert, U=update, D=delete. */
  def rowDiff(oldDf: DataFrame, newDf: DataFrame,
              keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    val payload = newDf.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "diff needs at least one non-key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshots must share a schema: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val o = oldDf.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("__graft_old"): _*)
    val n = newDf.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("__graft_new"): _*)
    // <=> (null-safe) so a payload column going null <-> non-null is a U,
    // never a silently-equal pair
    val joined = o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__graft_old").isNull, "I")
          .when(col("__graft_new").isNull, "D")
          .when(!(col("__graft_old") <=> col("__graft_new")), "U"))
      .filter(col("op").isNotNull)
    val side = coalesce(col("__graft_new"), col("__graft_old"))
    joined.select(keyCols.map(col) ++ Seq(col("op")) ++
      payload.map(p => side.getField(p).as(p)): _*)
  }
}
