package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus dedup: admit only new-batch records whose content
  * fingerprint has never been committed by a previous run.
  *
  * This is the shape a continuously-ingesting training-data pipeline
  * actually runs at 100 TB: the committed corpus is large and grows
  * forever, the day's batch is comparatively small, and re-shuffling the
  * whole history against every batch (a plain anti-join) makes ingestion
  * cost scale with corpus size instead of batch size. The reference's
  * compaction dedup re-reads the full window for the same reason
  * (`gobblin-compaction/.../mapreduce/MRCompactor.java` plans whole-dataset
  * jobs); here the committed side collapses to a Bloom sketch:
  *
  *   1. Build a Bloom filter over the committed fingerprints (one
  *      distributed aggregation pass; at steady state the sketch is built
  *      once per fingerprint-store snapshot and reused across batches).
  *   2. Broadcast it and prefilter the batch map-side. Bloom negatives
  *      are DEFINITELY uncommitted — they skip the join entirely.
  *   3. Only Bloom positives (true dups + the fpp sliver of false
  *      positives) shuffle into an exact anti-join against the committed
  *      hashes, which removes the false positives.
  *
  * The result is byte-identical to the exact anti-join — the sketch only
  * prunes — but the shuffled volume is `dup_rate + fpp` of the batch
  * instead of all of it, and the committed corpus is never re-scanned
  * beyond the sketch build.
  */
object IncrementalDedup {

  /** Exact-dedup survivors of `batch` against a committed fingerprint
    * store, collapsing within-batch duplicates to the minimum id.
    *
    * @param batch           new records (must contain `idCol`)
    * @param committedHashes one string column `h`: the committed
    *                        fingerprints (pre-distinct not required)
    * @param idCol           batch id column; survivors keep min(id) per hash
    * @param fingerprint     fingerprint expression over batch columns,
    *                        same function that produced `h`
    * @param fpp             Bloom false-positive rate: the fraction of
    *                        genuinely-new rows that pay the exact-join
    *                        shuffle anyway
    * @return (content_hash, idCol) — one row per surviving new document
    */
  def survivors(batch: DataFrame, committedHashes: DataFrame, idCol: String,
                fingerprint: Column, fpp: Double = 0.01): DataFrame = {
    val committed = committedHashes.select(col("h")).distinct()
    // Sketch build: one pass over committed hashes (treeAggregate under
    // stat.bloomFilter). The count sizes the sketch; a production caller
    // reads it from the fingerprint store's manifest instead of counting.
    val n = committed.count()
    if (n == 0) // first run: nothing committed, whole batch is new
      return batch.withColumn("__h", fingerprint)
        .groupBy(col("__h").as("content_hash"))
        .agg(min(col(idCol)).as(idCol))
    val bloom = committed.stat.bloomFilter("h", n, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    // Scalar UDF is deliberate here: Spark exposes no public Bloom
    // membership expression, and the sketch is opaque driver state. The
    // UDF is a map-side PREFILTER only — correctness never depends on it
    // (false positives are removed by the exact anti-join below). Null
    // fingerprints (null input column) are definitely-new: a null never
    // equi-matches the committed side, same as in survivorsExact.
    val might = udf((s: String) => s != null && bc.value.mightContain(s))
    val hashed = batch.withColumn("__h", fingerprint)
    val definitelyNew = hashed.filter(!might(col("__h")))
    val needVerify = hashed.filter(might(col("__h")))
      .join(committed, col("__h") === col("h"), "left_anti")
    definitelyNew.unionByName(needVerify)
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as(idCol))
  }

  /** [[survivors]] with PRE-BUILT Bloom sketches: the committed corpus
    * is never scanned to build the prefilter — the caller hands the
    * sketches (persisted per ingestion batch and loaded back, Bloom
    * union being exact) and a record is prefiltered out when ANY sketch
    * might contain it. `committedHashes` is still the exact-verify side,
    * but it only executes when Bloom positives exist — a batch of
    * entirely-new content never touches the committed store at all.
    *
    * CONTRACT: the sketches must jointly cover EVERY committed hash
    * (Bloom filters have no false negatives, so coverage is the only
    * obligation); admissions are then byte-identical to [[survivors]]
    * and [[survivorsExact]]. An empty sketch list asserts nothing is
    * committed. */
  def survivorsWithBlooms(batch: DataFrame, committedHashes: DataFrame,
                          idCol: String, fingerprint: Column,
                          blooms: Seq[org.apache.spark.util.sketch.BloomFilter])
      : DataFrame = {
    val hashed = batch.withColumn("__h", fingerprint)
    if (blooms.isEmpty)
      return hashed.groupBy(col("__h").as("content_hash"))
        .agg(min(col(idCol)).as(idCol))
    val bc = batch.sparkSession.sparkContext.broadcast(blooms.toArray)
    val might = udf((s: String) =>
      s != null && bc.value.exists(_.mightContain(s)))
    val definitelyNew = hashed.filter(!might(col("__h")))
    val committed = committedHashes.select(col("h")).distinct()
    val needVerify = hashed.filter(might(col("__h")))
      .join(committed, col("__h") === col("h"), "left_anti")
    definitelyNew.unionByName(needVerify)
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as(idCol))
  }

  /** Reference implementation (plain exact anti-join, full-batch shuffle):
    * what `survivors` must equal; used by tests and small corpora. */
  def survivorsExact(batch: DataFrame, committedHashes: DataFrame,
                     idCol: String, fingerprint: Column): DataFrame =
    batch.withColumn("__h", fingerprint)
      .join(committedHashes.select(col("h")).distinct(),
        col("__h") === col("h"), "left_anti")
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as(idCol))
}
