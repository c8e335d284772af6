package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *     set against the corpus; one map-side pass over the corpus computes
  *     all similarities, then a per-query top-k. Correctness baseline.
  *   - [[lshTopK]] — sign-random-projection (hyperplane) LSH: corpus and
  *     queries are bucketed by an m-bit signature; candidates are corpus
  *     vectors sharing a bucket with a query under any of `tables`
  *     independent hash tables. At 100 TB this avoids scoring the full
  *     corpus per query: the join is on bucket keys, candidates per query
  *     are O(bucket size × tables).
  *
  * All arithmetic is in double (cast once) via codegen'd higher-order
  * functions — no UDFs.
  */
object Ann {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (asDouble(a), asDouble(b))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact top-k cosine neighbors of each query vector.
    * `queries` must be small enough to broadcast (it is hinted). Excludes
    * self-matches on equal ids. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** m-bit sign-random-projection signature of a vector for one table —
    * one native eval computes ALL tables; this face picks one (see
    * [[graft.functions.SrpSignatures]] for why it is an Expression, not
    * higher-order functions). */
  def srpSignature(vec: Column, bits: Int, table: Int): Column =
    element_at(graft.functions.Srp.signatures(vec, bits, table + 1), table + 1)

  /** LSH-bucketed approximate top-k: candidates share a bucket in any
    * table, then exact cosine + per-query top-k over candidates only.
    *
    * The query side is MULTIPROBED: besides its own bucket, each query
    * probes every bucket at Hamming distance 1 (flip one signature bit).
    * Multiprobe multiplies only the tiny broadcast side by (bits+1) while
    * boosting per-table recall from p^bits to P(>= bits-1 bits agree) —
    * the standard trick to keep `tables` small at scale. Size `bits`
    * ~ log2(corpusSize / targetBucketSize). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 12,
              tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, multiprobe: Boolean): DataFrame = {
      val probes: Column => Column = sig =>
        if (!multiprobe) array(sig)
        else concat(array(sig), transform(sequence(lit(0), lit(bits - 1)),
          j => sig.bitwiseXOR(call_function("shiftleft", lit(1L), j))))
      // all table signatures in one native eval per row
      df.select(col(idCol).as(id), col(vecCol).as(s"__v_$id"), posexplode(
        graft.functions.Srp.signatures(col(vecCol), bits, tables))
        .as(Seq("tbl", "sig")))
        .select(col(id), col(s"__v_$id"), col("tbl"),
          explode(probes(col("sig"))).as("bucket"))
    }

    val qb = broadcast(bucketed(queries, "query_id", multiprobe = true))
    val cb = bucketed(corpus, "neighbor_id", multiprobe = false)
    val cand = cb.join(qb, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("__v_query_id"), col("__v_neighbor_id"))
      .distinct()
    val scored = cand.withColumn("cosine",
      cosine(col("__v_query_id"), col("__v_neighbor_id")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
