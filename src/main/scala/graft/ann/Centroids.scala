package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-centroid similarity scoring — the embedding-space outlier /
  * label-noise detector (a mislabeled or off-distribution vector sits
  * far from its own class centroid; the cheap first pass before
  * SemDeDup-style cleanup).
  *
  * Engine-exact by construction: vectors are quantized to integers
  * (round(x·scale)), so the per-label element-wise SUM vector is exact
  * integer arithmetic, and cos(v, centroid) is computed against the
  * sum vector directly — the 1/n of the mean CANCELS in the cosine, so
  * no float division ever enters an aggregation. The only floats are
  * the final per-row sqrt/divide over identical integer inputs, which
  * every IEEE engine computes bit-identically — that is what makes a
  * cosine score ORACLE-CHECKABLE when an averaged-centroid formulation
  * (order-dependent float sums) would not be.
  *
  * Scale shape: one posexplode + map-side-combined (label, pos) sum —
  * the only shuffle; the ≤ labels×dim sum table reassembles into a
  * tiny per-label array and broadcast-joins back; the scoring pass is
  * map-only HOFs (zip_with + aggregate) inside codegen.
  */
object Centroids {

  /** Append `cos_c` = rounded cosine between each row's quantized
    * vector and its label's quantized sum vector. Rows whose vector or
    * label is NULL, or whose quantized vector is all-zero, score NULL. */
  def centroidCosine(df: DataFrame, labelCol: String, vecCol: String,
                     scale: Int = 1000, roundTo: Int = 6,
                     outCol: String = "cos_c"): DataFrame = {
    require(scale > 0 && roundTo >= 0)
    val vq = transform(col(vecCol), x => round(x.cast("double") * scale))
    val q = df.withColumn("__graft_vq", vq)
    val sums = q
      .filter(col(labelCol).isNotNull && col("__graft_vq").isNotNull)
      .select(col(labelCol), posexplode(col("__graft_vq")).as(Seq("__p", "__x")))
      .groupBy(col(labelCol), col("__p"))
      .agg(sum(col("__x")).as("__s"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__s")))),
        e => e.getField("__s")).as("__graft_sv"))
    // the fused single-loop expression (graft.functions.DotProduct) —
    // same semantics as the HOF spelling, no intermediate array
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Ann.dot(a, b)
    val normProd = sqrt(dot(col("__graft_vq"), col("__graft_vq"))) *
      sqrt(dot(col("__graft_sv"), col("__graft_sv")))
    q.join(broadcast(sums), Seq(labelCol), "left")
      .withColumn(outCol,
        when(col("__graft_sv").isNull || col("__graft_vq").isNull ||
          normProd === 0.0d, lit(null).cast("double"))
          .otherwise(round(dot(col("__graft_vq"), col("__graft_sv")) / normProd,
            roundTo)))
      .drop("__graft_vq", "__graft_sv")
  }
}
