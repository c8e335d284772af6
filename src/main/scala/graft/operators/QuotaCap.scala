package graft.operators

import graft.text.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key quota capping — the "domain balancing" step of a pretraining
  * pipeline: keep at most `n` rows per key (source / domain / language),
  * chosen deterministically by a salted portable hash of the row id, so
  * the kept subset is reproducible run-to-run and engine-to-engine and is
  * an unbiased sample of each key's rows.
  *
  * The reference's analogue is the sampling converter + work-unit quota
  * family (gobblin-core/.../converter/SamplingConverter.java:35,
  * gobblin-runtime quota enforcement in
  * gobblin-service/.../UserQuotaManager.java semantics); quota capping is
  * the corpus-side variant where the cap must be exact and deterministic
  * because it defines the training set.
  *
  * Scale shape: the naive plan — one window `row_number() OVER
  * (PARTITION BY key ORDER BY hash)` — sorts every row of the biggest key
  * in ONE task; a single mega-domain (the classic web-crawl skew) stalls
  * the stage. This implementation is a two-level salted top-n:
  *
  *   1. level 1 partitions by (key, hash mod `subBuckets`) — the skewed
  *      key fans out over `subBuckets` tasks — and takes the per-bucket
  *      top `n` by (hash, id);
  *   2. level 2 re-windows the ≤ subBuckets·n survivors per key to the
  *      exact global top `n`.
  *
  * Exactness: every global-top-n row is its bucket's top-≤n, so level 1
  * never drops a winner. Both shuffles are bounded — the first spreads
  * rows `subBuckets`-ways per key, the second moves at most
  * subBuckets·n rows per key. Output is invariant to `subBuckets`.
  */
object QuotaCap {

  /** Keep the `n` rows of each `keyCol` group with the smallest
    * (salted hash of `idCol`, `idCol`) — `idCol` must be unique per row
    * (it is the deterministic tiebreak). Adds `quota_rank` (1-based rank
    * within the key). */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
                salt: String = "quota", subBuckets: Int = 32): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(subBuckets > 0, s"subBuckets must be positive: $subBuckets")
    val clash = df.columns.toSet
      .intersect(Set("quota_rank", "__graft_h", "__graft_r1"))
    require(clash.isEmpty,
      s"input columns collide with quota-cap columns: ${clash.mkString(", ")}")
    val hashed = df.withColumn("__graft_h", TextStats.portableHash60(
      concat(lit(salt), col(idCol).cast("string"))))
    val order = Seq(col("__graft_h"), col(idCol))
    val level1 = Window
      .partitionBy(col(keyCol), pmod(col("__graft_h"), lit(subBuckets)))
      .orderBy(order: _*)
    val level2 = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    hashed
      .withColumn("__graft_r1", row_number().over(level1))
      .filter(col("__graft_r1") <= n)
      .withColumn("quota_rank", row_number().over(level2).cast("long"))
      .filter(col("quota_rank") <= n)
      .drop("__graft_h", "__graft_r1")
  }
}
