package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous distribution-drift monitoring — the streaming face of
  * `operators/DriftCheck`, completing the streaming observability trio
  * (StreamingTopK = hot keys, MaterializedView.sink = aggregates,
  * this = SHAPE): every micro-batch folds its binned counts into a
  * cumulative state and scores the stream-so-far against a fixed
  * reference distribution with the exact total-variation permille —
  * the alert fires the moment the arriving data stops looking like
  * what the model trained on.
  *
  * State is the reduced (bin, count) frame — bounded by the bin
  * domain (same quantize-first contract as Profile/DriftCheck), never
  * by the stream length. Exactly-once via the batch-id-partitioned
  * state idiom ([[ContinuousIngest]]): counts after batch N live
  * under `batch_id=N`, a step reads the latest < N and overwrites
  * = N, so at-least-once replays rewrite identical bytes; the scored
  * series is itself keyed by batch id, so the monitoring feed never
  * double-counts a replay. Snapshots older than N-1 are swept.
  */
object StreamingDrift {

  private def latest(spark: SparkSession, dir: String,
                     before: Long): Option[(Long, DataFrame)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).filter(_ < before)
    if (ids.isEmpty) None
    else Some(ids.max -> spark.read.parquet(s"$dir/batch_id=${ids.max}"))
  }

  private[streaming] def step(spark: SparkSession, batch: DataFrame,
                              batchId: Long, binExpr: String,
                              refCounts: DataFrame, stateDir: String): Unit = {
    val batchCounts = batch
      .selectExpr(s"$binExpr AS bin").filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val folded = latest(spark, s"$stateDir/counts", batchId) match {
      case None => batchCounts
      case Some((_, prev)) =>
        prev.unionByName(batchCounts)
          .groupBy("bin").agg(sum(col("c")).as("c"))
    }
    folded.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/counts/batch_id=$batchId")
    // score the stream-so-far against the reference from the REDUCED
    // frames only; the series row for batch N overwrites =N (replay-
    // idempotent monitoring feed)
    val committed = spark.read.parquet(s"$stateDir/counts/batch_id=$batchId")
    // batch_id rides ONLY in the partition dir name — a same-named
    // data column would collide with partition discovery on read
    val tv = graft.operators.DriftCheck.tvDriftCounts(
        committed.withColumnRenamed("c", "ca"),
        refCounts.withColumnRenamed("c", "cb"), "bin")
      .select(col("n_a").as("rows_seen"), col("tv_permille"))
    tv.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/series/batch_id=$batchId")
    // bound the counts dir: N-1 survives for N's possible replay
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/counts")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath).foreach { d =>
      val n = d.getName
      if (n.startsWith("batch_id=") &&
        n.stripPrefix("batch_id=").toLong < batchId - 1)
        fs.delete(d, true)
    }
  }

  /** Attach to a stream: `reference` is a static frame of the expected
    * distribution (raw rows; binned here with the same `binExpr`). */
  def start(stream: DataFrame, binExpr: String, reference: DataFrame,
            stateDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val refCounts = reference
      .selectExpr(s"$binExpr AS bin").filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("c"))
      .persist()
    refCounts.count() // materialize once, not per batch
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(batch.sparkSession, batch, batchId, binExpr, refCounts, stateDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The monitoring feed: (batch_id, rows_seen, tv_permille) ordered
    * by batch — one row per committed micro-batch. */
  def series(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/series")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      return spark.emptyDataFrame
    spark.read.parquet(s"$stateDir/series").orderBy("batch_id")
  }
}
