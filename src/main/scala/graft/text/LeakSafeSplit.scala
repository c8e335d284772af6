package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.DupClusters
import graft.operators.Converters

/** Leakage-safe train/val/test splitting for training corpora: assign
  * splits by DUPLICATE CLUSTER, not by document. A plain per-document
  * hash split puts two near-duplicates on opposite sides of the
  * train/eval cut — the eval set then "contains" training data and
  * benchmark numbers inflate (the contamination literature's
  * train-test overlap problem, e.g. Lee et al. 2022 §6 measure it
  * directly). Splitting on the cluster id makes straddling impossible
  * by construction: every member of a cluster inherits the cluster's
  * split, and the assignment stays stable under corpus growth (the
  * portable hash is keyed by cluster id alone).
  *
  * Scale shape: [[byGroup]] is map-only (zero shuffles — the group id
  * is already on the row); [[byCluster]] adds only the cluster
  * resolution it is given pairs for ([[DupClusters.resolve]]'s
  * star-contraction + one annotate join); [[leakage]] is one
  * group-by over (group, split) pairs, combiner-reduced.
  */
object LeakSafeSplit {

  /** Label every row by its GROUP's split: a portable hash of
    * `groupCol` banded into `bands` ((label, width) with widths
    * summing to `mod`). All rows sharing a group land in the same
    * band, whatever partition or corpus snapshot they arrive in. */
  def byGroup(df: DataFrame, groupCol: String,
              bands: Seq[(String, Int)],
              outCol: String = "split", mod: Int = 100): DataFrame =
    Converters.hashSplit(groupCol, bands, outCol, mod)(df)

  /** Resolve duplicate clusters from verified `pairs` (id↔id edges —
    * exact-hash groups, MinHash-verified near-dups, SemDeDup cells…)
    * and split by the CLUSTER id. Singletons (docs in no pair) are
    * their own cluster, so they split by their own id. The cluster id
    * is kept in `clusterCol` for audit joins. Shares
    * [[DupClusters.resolve]]'s cache contract: the resolved component
    * map stays persisted (required for re-derivability on the
    * checkpointed distributed path) — clear it between many
    * resolutions in one session. */
  def byCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
                bands: Seq[(String, Int)],
                outCol: String = "split", clusterCol: String = "cluster_id",
                mod: Int = 100): DataFrame = {
    val resolved = DupClusters.resolve(docs, idCol, pairs)
    val named = if (clusterCol == "cluster_id") resolved
      else resolved.withColumnRenamed("cluster_id", clusterCol)
    byGroup(named, clusterCol, bands, outCol, mod)
  }

  /** Carve a FIXED-SIZE eval set with cluster quarantine: per stratum
    * (language, source, …), the `perStratum` docs with the smallest
    * portable doc-hash become `eval`; every unselected doc sharing a
    * dup-cluster with an eval doc becomes `quarantine` (it may appear
    * in NEITHER side — near-dups of eval members leaking into train is
    * the contamination this exists to stop, and putting them in eval
    * would double-count); everything else is `train`. Deterministic:
    * re-runs pick the same eval set, and a grown corpus can only add
    * eval docs, never swap... strictly: a new doc hashing under a
    * selected one displaces it, so PIN the eval set by persisting it —
    * this builder is for the initial carve.
    *
    * Scale: one rank window per stratum (shuffle by stratum) + one
    * semi-join of clusters against the eval clusters (eval is
    * perStratum·strata rows — broadcastable). */
  def carveEval(docs: DataFrame, idCol: String, clusterCol: String,
                stratumCol: String, perStratum: Int,
                roleCol: String = "role"): DataFrame = {
    require(perStratum > 0, s"perStratum must be positive: $perStratum")
    val h = graft.text.TextStats.portableHash60(
      concat(lit("eval:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(h.asc, col(idCol).asc)
    val ranked = docs.withColumn("__r", row_number().over(w))
    val isEval = col("__r") <= perStratum
    val evalClusters = ranked.filter(isEval)
      .select(col(clusterCol)).distinct()
    ranked
      .join(broadcast(evalClusters
          .withColumn("__in_eval_cluster", lit(true))),
        Seq(clusterCol), "left")
      .withColumn(roleCol,
        when(isEval, lit("eval"))
          .when(col("__in_eval_cluster"), lit("quarantine"))
          .otherwise(lit("train")))
      .drop("__r", "__in_eval_cluster")
  }

  /** The leakage audit: groups whose members carry MORE than one
    * distinct split label — rows `(group, n_splits, splits)`, empty
    * iff the split is leakage-free. [[byGroup]]/[[byCluster]] output
    * is leak-free by construction; the audit exists for split columns
    * that arrived from elsewhere (a vendor's split, a legacy per-doc
    * assignment) before training on them. */
  def leakage(df: DataFrame, groupCol: String,
              splitCol: String = "split"): DataFrame =
    df.groupBy(col(groupCol).as("group"))
      .agg(countDistinct(col(splitCol)).as("n_splits"),
        sort_array(collect_set(col(splitCol))).as("splits"))
      .filter(col("n_splits") > 1)
}
