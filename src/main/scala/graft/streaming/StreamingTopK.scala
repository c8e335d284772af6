package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import scala.collection.mutable

/** Continuous top-k over a stream — the streaming face of
  * `operators/HeavyHitters`: each micro-batch folds a bounded
  * Misra-Gries summary into a persistent k-counter state, so at any
  * moment the job can answer "what are the hot keys so far" with a
  * PROVEN error bound, while total state stays ≤ k rows forever (a
  * per-key exact count would grow with the key domain — unbounded on
  * URLs/user-agents/n-grams).
  *
  * Mergeable-summaries math (Agarwal et al. 2012, "Mergeable summary
  * structures"; MG merge = add counts, then subtract the (k+1)-th
  * largest and drop ≤0): every subtraction is tracked in a running
  * undercount bound `d`, so for any key, true_count ∈ [est, est + d]
  * (keys absent from the state have true_count ≤ d). `d` only grows
  * when summaries actually overflow — a stream whose key domain fits
  * in k counters reports EXACT counts (d = 0).
  *
  * Exactly-once via the batch-id-partitioned state idiom
  * ([[ContinuousIngest]]): the state AFTER batch N lives under
  * `batch_id=N`; a step reads the latest state with batch_id < N and
  * OVERWRITES =N, so an at-least-once replay recomputes byte-identical
  * rows. Snapshots older than N-1 are swept to bound the directory.
  */
object StreamingTopK {

  private val stateSchema = StructType(Seq(
    StructField("key", StringType), StructField("est", LongType),
    StructField("d", LongType), StructField("n", LongType)))

  /** Per-partition MG summaries with the information the merge needs:
    * (partitionId, key, count, decrements, rowsSeen). `decrements` and
    * `rowsSeen` repeat on every row of a partition (denormalized; the
    * driver reads them once per pid). A partition whose map decremented
    * to empty emits a cnt=0 sentinel so its meta is never lost. */
  private def partitionSummaries(batch: DataFrame, keyCol: String,
                                 k: Int): Array[(Int, String, Long, Long, Long)] = {
    val spark = batch.sparkSession
    import spark.implicits._
    // NULL is absence, not a key (same contract as HeavyHitters) — and
    // a null state row is reserved for the meta sentinel below
    batch.select(col(keyCol).cast("string"))
      .filter(col(keyCol).isNotNull).as[String]
      .mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        var dec = 0L
        var rows = 0L
        var lastKey: String = null
        it.foreach { key =>
          rows += 1
          lastKey = key
          counters.get(key) match {
            case Some(c) => counters.update(key, c + 1L)
            case None if counters.size < k => counters.update(key, 1L)
            case None =>
              dec += 1L
              val dead = mutable.ArrayBuffer.empty[String]
              counters.foreach { case (kk, c) =>
                if (c == 1L) dead += kk else counters.update(kk, c - 1L)
              }
              dead.foreach(counters.remove)
          }
        }
        val pid = TaskContext.getPartitionId()
        if (rows == 0) Iterator.empty
        else if (counters.isEmpty) Iterator((pid, lastKey, 0L, dec, rows))
        else counters.iterator.map { case (kk, c) => (pid, kk, c, dec, rows) }
      }.collect()
  }

  /** MG-reduce a merged count map to ≤ k entries; returns the reduced
    * map and the amount subtracted from every surviving key. */
  private def mgReduce(counts: mutable.HashMap[String, Long],
                       k: Int): Long = {
    if (counts.size <= k) 0L
    else {
      val sorted = counts.values.toArray.sorted(Ordering[Long].reverse)
      val v = sorted(k) // (k+1)-th largest: subtracting it leaves ≤ k positive
      val dead = counts.iterator
        .filter { case (_, c) => c - v <= 0L }.map(_._1).toArray
      dead.foreach(counts.remove)
      counts.mapValuesInPlace((_, c) => c - v)
      v
    }
  }

  private def latestState(spark: SparkSession, stateDir: String,
                          before: Long): (Map[String, Long], Long, Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (Map.empty, 0L, 0L, -1L)
    val ids = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
      .filter(_ < before)
    if (ids.isEmpty) return (Map.empty, 0L, 0L, -1L)
    val latest = ids.max
    val rows = spark.read.schema(stateSchema)
      .parquet(s"$stateDir/batch_id=$latest").collect()
    val counts = rows.iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) > 0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (d, n) =
      if (rows.isEmpty) (0L, 0L) else (rows(0).getLong(2), rows(0).getLong(3))
    (counts, d, n, latest)
  }

  /** One micro-batch fold — deterministic given (state before N, batch
    * content), so replays overwrite identical bytes. */
  private[streaming] def step(spark: SparkSession, batch: DataFrame,
                              batchId: Long, keyCol: String, k: Int,
                              stateDir: String): Unit = {
    require(k > 0)
    val summary = partitionSummaries(batch, keyCol, k)
    val dBatch = summary.groupBy(_._1).map(_._2.head._4).sum
    val nBatch = summary.groupBy(_._1).map(_._2.head._5).sum
    val (prev, prevD, prevN, _) = latestState(spark, stateDir, batchId)
    val combined = mutable.HashMap.empty[String, Long]
    prev.foreach { case (kk, c) => combined.update(kk, c) }
    summary.foreach { case (_, kk, c, _, _) =>
      if (c > 0) combined.update(kk, combined.getOrElse(kk, 0L) + c)
    }
    val v = mgReduce(combined, k)
    val d = prevD + dBatch + v
    val n = prevN + nBatch
    // the (d, n) meta is denormalized on every row — a state that
    // decremented to EMPTY must still persist it (losing d would make
    // a later estimates() claim "exact, any unlisted key ≤ 0" after
    // the very overflow that decremented keys away), so an empty
    // state writes one NULL-key meta sentinel
    val out = combined.toSeq.sortBy(r => (-r._2, r._1))
      .map { case (kk, c) => (kk, c, d, n) } match {
      case Seq() => Seq((null.asInstanceOf[String], 0L, d, n))
      case rows => rows
    }
    import spark.implicits._
    out.toDF("key", "est", "d", "n").coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/batch_id=$batchId")
    // bound the directory: N-1 must survive for N's possible replay
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath).foreach { dir =>
      val name = dir.getName
      if (name.startsWith("batch_id=") &&
        name.stripPrefix("batch_id=").toLong < batchId - 1)
        fs.delete(dir, true)
    }
  }

  /** Attach to a stream: fold every micro-batch into the MG state. */
  def start(stream: DataFrame, keyCol: String, k: Int, stateDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(batch.sparkSession, batch, batchId, keyCol, k, stateDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Current estimates: (key, est, est_hi=est+d, d, n), descending.
    * Any key NOT listed has true count ≤ d. */
  def estimates(spark: SparkSession, stateDir: String): DataFrame = {
    val (counts, d, n, _) = latestState(spark, stateDir, Long.MaxValue)
    import spark.implicits._
    counts.toSeq.sortBy(r => (-r._2, r._1))
      .map { case (kk, c) => (kk, c, c + d, d, n) }
      .toDF("key", "est", "est_hi", "d", "n")
  }
}
