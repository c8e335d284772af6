package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH signature index for CONTINUOUS near-dup dedup:
  * the corpus's band signatures are computed once and saved as a bucketed
  * table; each new batch probes the index with its own (tiny) signature
  * set and only candidate pairs ever touch document text again.
  *
  * This is the near-dup analog of the persisted IVF index (q64) and the
  * minhash analog of the Bloom-gated exact dedup (q67) — the three shapes
  * a 100 TB continuously-ingesting pipeline actually runs. Without an
  * index, every batch re-shingles and re-hashes the whole corpus
  * (O(corpus) text work per batch); with it, per-batch work is
  * O(batch + matched buckets).
  *
  * Scale mechanics:
  *  - the index table is BUCKETED on the probe key (band_idx, band_hash),
  *    so the probe join never shuffles the index side — only the batch's
  *    signatures move (the bucketed-join plan is pinned by a test);
  *  - each bucket's size is precomputed at build time (`bucket_n`), so
  *    the degenerate-boilerplate cap is a map-side filter at probe time,
  *    not an aggregation over the index;
  *  - appending a committed batch = inserting its signature rows into the
  *    same bucketed table (one write of O(batch) rows).
  */
object LshIndex {

  /** Create (replacing any prior) the signature index table for `docs`.
    * `dir` holds the table files (external); `numBuckets` should track
    * expected index size / executor count at scale. */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
            textCol: String, table: String, dir: String,
            n: Int = 3, k: Int = 64, numBands: Int = 32,
            numBuckets: Int = 16): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val bands = MinHashDedup.bands(docs, idCol, textCol, n, k, numBands)
      // one exchange shared by the window count AND the bucketed layout:
      // each task then writes only its own buckets' files
      .repartition(numBuckets, col("band_idx"), col("band_hash"))
      .withColumn("bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
    bands.write
      .option("path", dir)
      .bucketBy(numBuckets, "band_idx", "band_hash")
      .sortBy("band_idx", "band_hash")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append a new (already-admitted) batch's signatures to the index.
    * `bucket_n` staleness is benign: the cap exists to shed degenerate
    * boilerplate buckets, and those are shed at build; rebuild to refresh
    * counts when append volume becomes comparable to the corpus. */
  def append(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String, table: String,
             n: Int = 3, k: Int = 64, numBands: Int = 32,
             numBuckets: Int = 16): Unit =
    MinHashDedup.bands(docs, idCol, textCol, n, k, numBands)
      .repartition(numBuckets, col("band_idx"), col("band_hash"))
      .withColumn("bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .write.mode("append").format("parquet")
      .insertInto(table)

  /** Candidate (id_a = indexed corpus id, id_b = batch id) pairs: the
    * batch's signatures join the bucketed index on (band_idx, band_hash).
    * Buckets above `maxBucketSize` in the INDEX are shed map-side via the
    * precomputed `bucket_n` (same safety default as candidatePairs). */
  def probe(spark: SparkSession, table: String, batch: DataFrame,
            idCol: String, textCol: String,
            n: Int = 3, k: Int = 64, numBands: Int = 32,
            maxBucketSize: Int = 10000): DataFrame = {
    val idx = spark.table(table)
      .filter(col("bucket_n") <= maxBucketSize)
      .withColumnRenamed(idCol, "id_a")
    val probes = MinHashDedup.bands(batch, idCol, textCol, n, k, numBands)
      .withColumnRenamed(idCol, "id_b")
    idx.join(probes, Seq("band_idx", "band_hash"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }
}
