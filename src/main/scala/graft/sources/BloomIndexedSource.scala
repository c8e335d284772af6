package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter index for POINT probes on a column the layout
  * is NOT clustered by. Zone maps ([[StatsPrunedSource]],
  * [[ZOrderSource]]) skip files by (min, max) envelope — useless for an
  * equality probe on a high-cardinality key scattered uniformly across
  * a time-clustered table (every file's [min, max] contains every key).
  * A small per-file Bloom answers "might file F contain key k?" with no
  * false negatives, so a point lookup opens the handful of files that
  * MIGHT hold the key instead of the whole table; false positives only
  * open extra files, never corrupt the answer (the residual filter
  * re-applies the predicate — same contract as the zone maps).
  *
  * This is Parquet's column-index/bloom idea lifted to the FILE level
  * where planning can use it before any footer is opened, and the
  * point-probe complement of the Iceberg-manifest pattern the sidecar
  * stores reuse. The reference has no data-skipping layer at all.
  *
  * Scale shape: the index build is one distributed pass over the
  * written data (aggregateByKey per file); the sidecar is
  * O(files × bloomBytes) and is probed DISTRIBUTED (a filter over the
  * sidecar frame) — the driver only ever collects the matching file
  * names, so a million-file table never materializes its blooms on
  * the driver.
  */
object BloomIndexedSource {

  private def indexDir(dir: String) = s"$dir/_graft_bloom"

  /** Publish `df` clustered by `clusterCol` (range layout, e.g. time)
    * with a per-file Bloom over LONG key column `keyCol` in a
    * `_graft_bloom` sidecar. The blooms are built from the data
    * ACTUALLY written (read-back with input_file_name). */
  def writeWithBloom(df: DataFrame, dir: String, keyCol: String,
                     clusterCol: String, numFiles: Int = 32,
                     fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(numFiles, col(clusterCol))
      .write.mode("overwrite").parquet(dir)
    // NULL keys can never match a point probe — and Row.getLong on a
    // null would NPE the index build AFTER the data landed, leaving a
    // half-published table (data without its sidecar)
    val written = spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
    // expected insertions per file with headroom; a tighter file just
    // saturates toward fpp, never loses a key
    val perFile = math.max(64L, 2L * written.count() / math.max(1, numFiles))
    val blooms = written.rdd
      .map(r => (r.getString(0), r.getLong(1)))
      .aggregateByKey(BloomFilter.create(perFile, fpp))(
        (bf, k) => { bf.putLong(k); bf },
        (a, b) => { a.mergeInPlace(b); a })
      .map { case (file, bf) =>
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (file, bos.toByteArray)
      }
    spark.createDataFrame(blooms).toDF("file", "bloom")
      .coalesce(1).write.mode("overwrite").parquet(indexDir(dir))
  }

  /** Rows with `keyCol` IN `keys`, opening only files whose Bloom
    * might contain at least one probe key. The sidecar is filtered
    * distributed; only matching FILE NAMES reach the driver. Returns
    * (frame, filesKept, filesTotal). */
  def readPoints(spark: SparkSession, dir: String, keyCol: String,
                 keys: Seq[Long]): (DataFrame, Long, Long) = {
    require(keys.nonEmpty)
    val idx = spark.read.parquet(indexDir(dir))
    val probe = keys.toArray
    val mightHold = udf { bytes: Array[Byte] =>
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      probe.exists(bf.mightContainLong)
    }
    val kept = idx.filter(mightHold(col("bloom")))
      .select("file").collect().map(_.getString(0))
    val total = idx.count()
    val frame =
      if (kept.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
        .filter(col(keyCol).isin(keys: _*))
    (frame, kept.length.toLong, total)
  }
}
