package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE (upsert + delete) into a partitioned table, copy-on-write: only
  * the partitions an affected key lives in — or an insert lands in — are
  * rewritten; every other partition's files are never read or written.
  *
  * Reference: the reference applies changelogs by compaction
  * (RecordKeyDedupReducerBase latest-per-key over base+delta) and
  * deletes by per-partition purge rewrite (HivePurgerSource.java:66 —
  * our [[Purge.purgePartitioned]]); this operator is the two fused into
  * lakehouse MERGE semantics, reusing the purge's partition-swap
  * protocol ([[graft.sinks.AtomicPublisher]] staged rename, all-or-
  * nothing per partition, idempotent re-run after a crash).
  *
  * Scale shape: affected-partition discovery is one semi-join — change
  * keys broadcast when the changelog is CDC-sized (counted, not
  * assumed: past `maxBroadcastKeys` the joins fall back LOUDLY to
  * shuffle, so a backfill-sized changelog cannot blow the broadcast);
  * the rewrite reads ONLY the affected slice. An upsert may move a row across partitions: the old partition
  * is affected via the key match, the new one via the upsert's own
  * partition value, so both rewrite and the move is atomic per
  * partition. Brand-new partitions (insert-only) appear via the staged
  * promote with no old dir to swap.
  */
object Merge {

  /** Latest-change-wins view of `changes`: one row per key, deduped by
    * `delta` orderings when given ([[Dedup.keyDeltaTop1]]); rows where
    * `deleteWhen` holds are deletions, everything else a full-row
    * upsert. */
  private def normalized(changes: DataFrame, keyCols: Seq[String],
                         delta: Seq[Column]): DataFrame =
    if (delta.isEmpty) changes
    else changes.transform(Dedup.keyDeltaTop1(keyCols, delta))

  /** The merged table as a frame: base rows with no change, plus every
    * upsert row (deletes simply vanish). `changes` must carry base's
    * columns plus whatever `deleteWhen` reads. `broadcastChangeKeys`
    * hints the anti-join: right for CDC-sized changelogs (the normal
    * case); pass false for a bulk backfill-sized changelog so the
    * anti-join shuffles instead of blowing the broadcast —
    * [[mergePartitioned]] decides from an actual count. */
  def merged(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
             deleteWhen: Column, delta: Seq[Column] = Seq.empty,
             broadcastChangeKeys: Boolean = true): DataFrame = {
    val ch = normalized(changes, keyCols, delta)
    val hint: DataFrame => DataFrame =
      if (broadcastChangeKeys) broadcast(_: DataFrame) else identity
    val untouched = base.join(
      hint(ch.select(keyCols.map(col): _*).distinct()),
      keyCols, "left_anti")
    val upserts = ch.filter(!deleteWhen)
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }

  final case class MergeStats(affected: Seq[Any], removedPartitions: Seq[Any],
                              upserted: Long, deleted: Long)

  /** Apply the changelog IN PLACE over a `partitionCol`-partitioned dir,
    * rewriting only affected partitions. Verifies after the swap that no
    * deleted key survived and every upsert landed — a merge must never
    * silently half-apply. */
  def mergePartitioned(spark: SparkSession, dir: String, partitionCol: String,
                       changes: DataFrame, keyCols: Seq[String],
                       deleteWhen: Column, delta: Seq[Column] = Seq.empty,
                       format: String = "parquet",
                       maxBroadcastKeys: Long = 5000000L): MergeStats = {
    val ch = normalized(changes, keyCols, delta).persist()
    try {
      val base = spark.read.format(format).load(dir)
      // broadcast guard: "the changelog is small relative to the base"
      // is the NORMAL CDC case, not a law — a backfill-sized changelog
      // would blow the broadcast. Count the (persisted) changelog and
      // fall back LOUDLY to shuffle joins past the threshold; results
      // are identical either way (MergeSpec pins bit-equality).
      val nCh = ch.count()
      val small = nCh <= maxBroadcastKeys
      if (!small)
        System.err.println(s"[merge] changelog has $nCh rows " +
          s"(> maxBroadcastKeys=$maxBroadcastKeys): joining via shuffle " +
          "instead of broadcast — expected for backfills, not CDC")
      def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
      val chKeys = ch.select(keyCols.map(col): _*).distinct()
      // partitions holding a matched base row + partitions upserts target
      val affected = (base
        .join(hint(chKeys), keyCols, "left_semi")
        .select(col(partitionCol))
        .unionByName(ch.filter(!deleteWhen).select(col(partitionCol))))
        .distinct().collect().map(_.get(0)).toSeq
      if (affected.isEmpty)
        return MergeStats(Nil, Nil, 0L, nCh)
      val (nullAffected, valAffected) = affected.partition(_ == null)
      val inAffected = {
        val byVal =
          if (valAffected.nonEmpty) col(partitionCol).isin(valAffected: _*)
          else lit(false)
        if (nullAffected.nonEmpty) byVal || col(partitionCol).isNull else byVal
      }
      val survivors = merged(base.filter(inAffected), ch, keyCols, deleteWhen,
        broadcastChangeKeys = small)
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = new Path(dir, ".merge-staging")
      if (fs.exists(staging)) fs.delete(staging, true)
      survivors.write.mode(SaveMode.Overwrite).format(format)
        .partitionBy(partitionCol).save(staging.toString)
      val removed = Seq.newBuilder[Any]
      affected.foreach { v =>
        val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partitionCol, if (v == null) null else v.toString)
        val src = new Path(staging, dirName)
        val dst = new Path(dir, dirName)
        if (fs.exists(src))
          graft.sinks.AtomicPublisher.Staged(fs, src, dst, "merge").promote()
        else { fs.delete(dst, true); removed += v }
      }
      fs.delete(staging, true)

      // post-swap verification: deletes gone, upserts present — scoped
      // to the AFFECTED partitions (partition pruning applies): the
      // merge's contract only touches those, so scanning the whole
      // table would cost O(table) on an O(delta) operation AND fail
      // spuriously when the same key legitimately lives in an
      // untouched partition
      val after = spark.read.format(format).load(dir).filter(inAffected)
      val delKeys = ch.filter(deleteWhen).select(keyCols.map(col): _*)
      require(after.join(hint(delKeys), keyCols, "left_semi").isEmpty,
        s"merge verification failed: deleted keys remain in $dir")
      val upsKeys = ch.filter(!deleteWhen)
        .select(keyCols.map(col): _*).distinct()
      val nUps = upsKeys.count()
      val landed = after.join(hint(upsKeys), keyCols, "left_semi")
        .select(keyCols.map(col): _*).distinct().count()
      require(landed == nUps,
        s"merge verification failed: $landed of $nUps upsert keys present in $dir")
      MergeStats(affected, removed.result(), nUps, delKeys.count())
    } finally { ch.unpersist(); () }
  }
}
