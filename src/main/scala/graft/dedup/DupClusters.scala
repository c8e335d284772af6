package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: candidate/verified pairs are only half of
  * near-dup dedup — a training-data pipeline must then group pairs into
  * clusters (connected components) and keep ONE survivor per cluster.
  * (The reference's dedup is exact-key only — AvroKeyDedupReducer.java:39;
  * this closes the near-dup loop the same way its reducer keeps one record
  * per key.)
  *
  * Components by iterative min-label propagation: every node starts as its
  * own label; each round a node adopts the minimum label among itself and
  * its neighbors; fixpoint = every component labeled by its minimum id.
  * Rounds needed = component diameter — near-dup clusters are shallow
  * (dozens of docs, diameter a few hops), so the cap of `maxIter` rounds
  * is generous; the loop stops early on convergence (one count per round,
  * over O(pairs) rows, never O(docs^2)). Label state is persisted per
  * round and the previous round unpersisted, so lineage stays flat. For
  * adversarial graphs with long chains swap in the large-star/small-star
  * alternation — same join shape, O(log n) rounds.
  */
object DupClusters {

  /** (id, cluster) for every id that appears in `pairs`; cluster = the
    * minimum id of the connected component.
    *
    * Hybrid execution: when the (deduped) edge set fits comfortably on
    * the driver (`driverMaxEdges`, default 2^20 — near-dup pair sets are
    * a vanishing fraction of corpus size), a single collect + union-find
    * resolves components in one pass with zero iterative jobs — the same
    * driver-side planning budget the reference spends on work units.
    * Larger edge sets run the distributed min-label propagation loop.
    * Both paths produce identical labels.
    *
    * The returned DataFrame is PERSISTED (the propagation loop needs the
    * final labels materialized and re-derivable without replaying every
    * round); callers running many resolutions in one session should
    * `.unpersist()` it — or the frame returned by [[resolve]] — once
    * consumed. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          driverMaxEdges: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val integralIds = edges.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    if (integralIds && edges.count() <= driverMaxEdges)
      return driverComponents(edges)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("cluster").as("nbr")), "dst")
          .groupBy(col("src").as("id")).agg(min(col("nbr")).as("nbr_min"))
        val next = labels
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
              .as("cluster"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val changed = next.join(
          labels.select(col("id"), col("cluster").as("prev")), "id")
          .filter(col("cluster") =!= col("prev")).count()
        labels.unpersist()
        labels = next
        converged = changed == 0
        i += 1
      }
      require(converged, s"components did not converge in $maxIter rounds")
      labels
    } finally edges.unpersist()
  }

  /** Driver union-find (path compression + union by min) over a collected
    * edge list; labels = min id per component, matching the loop. The
    * result is cast back to the input id type so callers see the SAME
    * schema whichever path ran — data volume must never change the
    * contract. */
  private def driverComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val idType = edges.schema("src").dataType
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    edges.unpersist()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // keep the smaller id as root = the cluster label
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b)): Unit
    }
    val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    spark.createDataset(nodes.toSeq.map(n => (n, find(n))))
      .toDF("id", "cluster")
      .select(col("id").cast(idType), col("cluster").cast(idType))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Annotate every doc with its cluster id (its own id when it is in no
    * pair — singletons are their own cluster). */
  def resolve(docs: DataFrame, idCol: String, pairs: DataFrame,
              maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, maxIter)
      .withColumnRenamed("id", idCol)
    docs.join(comp, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
  }

  /** One survivor per cluster: the minimum-id member (plus every
    * singleton). */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame,
                maxIter: Int = 20): DataFrame =
    resolve(docs, idCol, pairs, maxIter)
      .filter(col(idCol) === col("cluster_id"))
      .drop("cluster_id")
}
