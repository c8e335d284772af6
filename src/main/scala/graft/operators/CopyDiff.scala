package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distcp-style copy planning: copy only files missing or different at the
  * target, comparing (path, length) manifests.
  *
  * Reference: gobblin-data-management copy —
  * RecursiveCopyableDataset diffing source/target listings, CopyableFile
  * (copy/CopyableFile.java:68), prioritized allocation under a byte budget
  * (CopySource.java:207-222).
  *
  * Spark-first: manifests are DataFrames (path, length, mod_time...);
  * the diff is an anti-join on (path, length). Target listings are usually
  * much smaller than a 100 TB source scan — broadcast the target manifest.
  * Budgeted prioritization = sort + running-sum window + filter.
  */
object CopyDiff {

  /** Files present in src whose (relPath, length) is absent at the target.
    * `broadcastDst = false` for replica-sync diffs where the target
    * manifest is source-sized (HiveCopy): a broadcast of millions of
    * target rows would OOM the driver — the shuffle anti-join is the
    * right plan there. */
  def diff(src: DataFrame, dst: DataFrame,
           on: Seq[String] = Seq("path", "length"),
           broadcastDst: Boolean = true): DataFrame = {
    val d = dst.select(on.map(col): _*).distinct()
    src.join(if (broadcastDst) broadcast(d) else d, on, "left_anti")
  }

  /** Allocate highest-priority files under a total byte budget
    * (CopySource prioritization): order by priority, keep the prefix whose
    * cumulative size fits.
    *
    * The running sum is DISTRIBUTED: a global `Window.orderBy` would pull
    * the entire manifest into one task (a 100 TB copy plan has millions of
    * files). Instead, constant bucket boundaries (approx quantiles of the
    * priority column, collected once and inlined as literals so every
    * re-execution buckets identically) split the manifest into ordered
    * buckets; each bucket computes its local running sum in parallel and a
    * driver-side prefix over the tiny per-bucket totals supplies the
    * offsets. Ties in the priority column land in the same bucket, so the
    * result equals the single-window plan whenever the priority order is
    * total; heavily skewed priorities degrade toward fewer active buckets.
    * Eager: collects quantiles + bucket totals (planning-time actions,
    * O(buckets) rows) when called. */
  def allocateUnderBudget(files: DataFrame, lengthCol: String,
                          priorityCol: String, ascending: Boolean,
                          budgetBytes: Long, buckets: Int = 64): DataFrame = {
    val dir = if (ascending) col(priorityCol).asc else col(priorityCol).desc
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = files.stat.approxQuantile(priorityCol, probs, 0.001)
      .distinct.sorted.toSeq
    // bucket index increases along the scan order for either direction;
    // NULL priorities follow the window defaults (asc = nulls FIRST ->
    // bucket 0; desc = nulls LAST -> one past the last bound)
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else {
        val indicator = bounds.map { b =>
          if (ascending) when(col(priorityCol) > lit(b), 1).otherwise(0)
          else when(col(priorityCol) < lit(b), 1).otherwise(0)
        }.reduce(_ + _)
        if (ascending) when(col(priorityCol).isNull, lit(0)).otherwise(indicator)
        else when(col(priorityCol).isNull, lit(bounds.size)).otherwise(indicator)
      }
    val bucketed = files.withColumn("__graft_bkt", bucketExpr)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__graft_bkt")).orderBy(dir)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__graft_cum_local",
      sum(col(lengthCol)).over(w))

    val totals = bucketed.groupBy("__graft_bkt")
      .agg(sum(col(lengthCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = totals.scanLeft((0, 0L)) {
      case ((_, acc), (bkt, t)) => (bkt + 1, acc + t)
    }.init.zip(totals).map { case ((_, off), (bkt, _)) => bkt -> off }.toMap

    val offExpr = offsets.foldLeft(lit(0L)) { case (acc, (bkt, off)) =>
      when(col("__graft_bkt") === bkt, lit(off)).otherwise(acc)
    }
    local.withColumn("__graft_cum", col("__graft_cum_local") + offExpr)
      .filter(col("__graft_cum") <= budgetBytes)
      .drop("__graft_bkt", "__graft_cum_local", "__graft_cum")
  }

  /** Build a file manifest DataFrame by listing a filesystem path
    * (driver-side, like the reference's dataset finders). */
  def listManifest(spark: SparkSession, root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Seq[(String, Long, Long)] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toString.stripPrefix(fs.makeQualified(p).toString),
          st.getLen, st.getModificationTime))
      }
    walk(p).toDF("path", "length", "mod_time")
  }
}
