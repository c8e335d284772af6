package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.IncrementalDedup
import graft.text.{ShardPack, TextStats}

/** The continuous-ingest loop as a Structured Streaming job: every
  * micro-batch of arriving documents is Bloom-gated exact-deduped
  * against everything committed so far, and the survivors are packed
  * into training shards CONTINUING the committed shard sequence — the
  * streaming form of the batch loop ContinuousIngestSpec pins, and the
  * shape a 100 TB corpus actually ingests through (the reference's
  * streaming ingestion + its dedup/compaction jobs fused into one
  * incremental pipeline; see gobblin-runtime's streaming execution mode
  * and gobblin-compaction's dedup jobs).
  *
  * Exactly-once WITHOUT a transaction log: every piece of state is
  * partitioned by the micro-batch id —
  *   stateDir/fp/batch_id=N      committed content fingerprints
  *   stateDir/off/batch_id=N     the running weight offset AFTER batch N
  *   outDir/batch_id=N           the packed survivor docs
  * and batch N reads only partitions with batch_id < N. foreachBatch
  * replays are at-least-once, but a replayed batch N sees byte-identical
  * inputs (its own partial writes are excluded by the predicate) and
  * every stage is deterministic (md5 fingerprints, hash-ordered
  * packing), so it OVERWRITES batch_id=N with the same rows it wrote
  * the first time. Readers of outDir always see complete batches.
  *
  * Scale shape: the committed-fingerprint scan collapses into the
  * broadcast Bloom sketch (IncrementalDedup), so each batch pays
  * O(batch) work plus one partition-pruned read of the fingerprint
  * store; compact fp/ periodically (coalesce old batch partitions) the
  * same way any log-structured store is compacted. Batch-id pruning is
  * a partition filter, never a file-content read. */
object ContinuousIngest {

  private def dirNonEmpty(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** One micro-batch step — also directly usable as the batch-mode loop
    * body (stream/batch parity by construction). `substringW = Some(w)`
    * additionally scrubs PASSAGES (w-token windows, Lee et al. 2022)
    * duplicated against the committed gram index or a lower-id doc of
    * the same batch — whole-doc dedup drops re-arrivals, the substring
    * pass removes quoted/boilerplate spans inside otherwise-novel docs.
    * The gram index is committed per batch (stateDir/grams/batch_id=N,
    * grams of the ORIGINAL pre-scrub text of kept docs — post-scrub
    * grams would manufacture seam-spanning windows that never existed)
    * with the same strictly-earlier-partitions replay rule as the
    * fingerprints. */
  private[streaming] def step(spark: SparkSession, batch: DataFrame,
                              batchId: Long, idCol: String, textCol: String,
                              budget: Long, stateDir: String,
                              outDir: String,
                              substringW: Option[Int] = None): Unit = {
    val fpDir = s"$stateDir/fp"
    val offDir = s"$stateDir/off"
    val gramsDir = s"$stateDir/grams"
    // state BEFORE this batch: strictly earlier partitions only, so a
    // replay of batch N never sees N's own partial writes
    val committed =
      if (dirNonEmpty(spark, fpDir))
        spark.read.parquet(fpDir).filter(col("batch_id") < batchId).select("h")
      else spark.emptyDataFrame.select(lit("").as("h")).limit(0)
    val offset =
      if (dirNonEmpty(spark, offDir)) {
        val prior = spark.read.parquet(offDir).filter(col("batch_id") < batchId)
        if (prior.isEmpty) 0L
        else prior.orderBy(col("batch_id").desc).select("off").head().getLong(0)
      } else 0L

    // whole-content dedup keys on the ARRIVING text (a re-arrival of an
    // already-scrubbed doc's original must still drop), so the content
    // fingerprint is taken before any scrubbing
    val exact = IncrementalDedup.survivors(
        batch, committed, idCol, TextStats.contentFingerprint(col(textCol)))
      .join(batch, idCol)
    val fresh = substringW match {
      case Some(w) =>
        val committedGrams =
          if (dirNonEmpty(spark, gramsDir))
            spark.read.parquet(gramsDir)
              .filter(col("batch_id") < batchId).select("h")
          else spark.emptyDataFrame.select(lit(0L).as("h")).limit(0)
        val scrubbed = graft.text.SubstringDedup.cleanIncremental(
          exact, idCol, textCol, committedGrams, w)
        exact.drop(textCol).join(scrubbed, Seq(idCol))
      case None => exact
    }
    val packed = ShardPack.packByBudget(
        fresh.withColumn("w", length(col(textCol)).cast("long")),
        idCol, "w", budget, startOffset = offset)
      .persist()
    try {
      val newWeight = packed.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
      // idempotent publish: each write targets exactly batch_id=N
      packed.drop("cum_before")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch_id=$batchId")
      packed.select(col("content_hash").as("h"))
        .write.mode(SaveMode.Overwrite).parquet(s"$fpDir/batch_id=$batchId")
      substringW.foreach { w =>
        // the committed corpus participates in future passage dedup only
        // through this index. Index the ORIGINAL (pre-scrub) text of the
        // kept docs, not the published text: grams of post-scrub text
        // include windows spanning a scrub seam that never co-occurred
        // in any source document, and such phantom grams would scrub
        // legitimate novel text in later batches (and diverge from
        // batch-mode SubstringDedup.clean, which grams original text)
        val keptOriginal = exact.join(
          packed.select(col(idCol)), Seq(idCol), "left_semi")
        graft.text.SubstringDedup.gramIndex(keptOriginal, idCol, textCol, w)
          .write.mode(SaveMode.Overwrite).parquet(s"$gramsDir/batch_id=$batchId")
      }
      spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(offset + newWeight)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("off",
              org.apache.spark.sql.types.LongType, nullable = false))))
        .write.mode(SaveMode.Overwrite).parquet(s"$offDir/batch_id=$batchId")
    } finally packed.unpersist(blocking = false)
  }

  /** Start the ingest stream. `stream` must carry `idCol` and `textCol`;
    * survivors land in outDir/batch_id=N with their shard_id. */
  def start(stream: DataFrame, idCol: String, textCol: String, budget: Long,
            stateDir: String, outDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            substringW: Option[Int] = None): StreamingQuery = {
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(batch.sparkSession, batch, batchId, idCol, textCol, budget,
          stateDir, outDir, substringW)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
