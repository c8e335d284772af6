package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import scala.collection.mutable

/** Exact distributed top-m by frequency with BOUNDED map-side state.
  *
  * A plain `groupBy(key).count.orderBy.limit(m)` shuffles one row per
  * DISTINCT key — at 100 TB a high-cardinality key (URLs, n-grams,
  * user agents) makes that shuffle the job. This operator runs
  * Misra-Gries candidate summaries inside each partition instead
  * (Misra & Gries 1982 "Finding repeated elements"): at most `k`
  * counters live at any moment regardless of partition size, so the
  * shuffle carries ≤ partitions·k candidate rows. One exact recount
  * pass restricted to the merged candidate set then produces TRUE
  * counts — the sketch only bounds WHICH keys need an exact count,
  * never the counts themselves, so the result is exact, not
  * approximate, whenever the certificate below holds.
  *
  * Exactness certificate (checked at runtime, refused loudly if it
  * fails): a key absent from every partition summary has global
  * frequency ≤ N/(k+1) (each absence costs ≤ partitionN/(k+1),
  * summed over partitions). Therefore the exact top-m is provably
  * complete when EITHER
  *   - no partition ever overflowed its k counters (the summaries
  *     are then exact per-partition counts and the candidate set is
  *     every key), OR
  *   - the m-th candidate's exact count > N/(k+1) — no hidden key
  *     can beat it.
  * Raise `k` until the certificate holds for the target m; the cost
  * is map-side memory only, never shuffle width.
  *
  * Mirrors the frequency-analysis face of the reference's compaction
  * metrics (gobblin-compaction record-count verifiers) generalized to
  * a reusable operator.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries summaries: (key, lowerBoundCount,
    * partitionOverflowed). State is a HashMap capped at `k` entries;
    * on overflow every counter decrements by one and zeros drop (O(k),
    * amortized O(1) per row since an overflow needs ≥ k prior
    * arrivals). The emitted counts are LOWER bounds (undercount
    * ≤ partitionN/(k+1)); only the key set is consumed downstream. */
  def summaries[T](ds: Dataset[T], k: Int)(
      implicit enc: Encoder[(T, Long, Boolean)]): Dataset[(T, Long, Boolean)] = {
    require(k > 0, s"k must be positive, got $k")
    ds.mapPartitions { it =>
      val counters = mutable.HashMap.empty[T, Long]
      var overflowed = false
      var lastKey: Option[T] = None
      it.foreach { key =>
        lastKey = Some(key)
        counters.get(key) match {
          case Some(c) => counters.update(key, c + 1L)
          case None if counters.size < k => counters.update(key, 1L)
          case None =>
            overflowed = true
            val dead = mutable.ArrayBuffer.empty[T]
            counters.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else counters.update(kk, c - 1L)
            }
            dead.foreach(counters.remove)
        }
      }
      // an overflowed partition whose map decremented to empty must
      // still surface its flag — otherwise the exactness certificate
      // downstream never fires and an incomplete answer ships silently.
      // cnt=0 marks the sentinel; candidates are recounted exactly, so
      // an extra candidate key is harmless.
      if (overflowed && counters.isEmpty)
        Iterator((lastKey.get, 0L, true))
      else
        counters.iterator.map { case (kk, c) => (kk, c, overflowed) }
    }
  }

  /** Exact top-m keys of `df(keyCol)` by frequency, deterministic
    * (count DESC, key ASC) order. String and integral key columns
    * (integrals are widened to BIGINT). Output: (keyCol, cnt).
    *
    * NULL is absence, not a key: rows with a NULL key are EXCLUDED
    * before counting (they would otherwise corrupt the typed summary —
    * a null long decodes as 0 — and vanish from the recount's IN
    * filter, silently dropping what might be the most frequent
    * "value"). Count nulls separately if NULL frequency is the signal
    * you are after.
    *
    * `maxCandidates` bounds the driver-side candidate pull — if the
    * merged candidate set exceeds it the data is telling you `k` is
    * far too large for its skew (or the key is near-uniform and a
    * plain groupBy is the right tool); refused loudly rather than
    * silently collecting an unbounded set. */
  def topExact(df: DataFrame, keyCol: String, m: Int, k: Int,
               maxCandidates: Int = 100000): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    val dt = df.schema(keyCol).dataType
    val nonNull = df.filter(col(keyCol).isNotNull)
    val keyed = dt match {
      case StringType => nonNull.select(col(keyCol))
      case LongType => nonNull.select(col(keyCol))
      case IntegerType => nonNull.select(col(keyCol).cast("bigint").as(keyCol))
      case other => throw new IllegalArgumentException(
        s"heavy-hitter key must be string or integral, $keyCol is $other")
    }
    val summary = dt match {
      case StringType => summaries(keyed.as[String], k).toDF("key", "cnt", "ovf")
      case _ => summaries(keyed.as[Long], k).toDF("key", "cnt", "ovf")
    }
    // ≤ partitions·k rows: tiny by construction, safe to pull.
    val rows = summary.groupBy("key")
      .agg(max("ovf").as("ovf"))
      .limit(maxCandidates + 1)
      .collect()
    require(rows.length <= maxCandidates,
      s"candidate set exceeds maxCandidates=$maxCandidates — " +
        s"k=$k is oversized for this key's skew; lower k or use a plain groupBy")
    val anyOverflow = rows.exists(_.getBoolean(1))
    val candidates = rows.map(_.get(0))
    // Exact recount pass. Candidate membership: an IN literal for small
    // sets (codegen'd, analysis-cheap); a broadcast join above that — a
    // 100k-element In expression blows up analysis/codegen time and
    // driver memory long before any data moves. Non-candidate rows fold
    // into one NULL-key group so the SAME scan yields N for the
    // exactness certificate (map-side combine reduces the NULL group to
    // one row per task — no skewed shuffle key); this pass and the
    // summary pass are the operator's only two scans of the input, the
    // Misra-Gries minimum.
    val isInThreshold = 2048
    val marked =
      if (candidates.length <= isInThreshold)
        keyed.withColumn("__k",
          when(col(keyCol).isin(candidates: _*), col(keyCol)))
      else {
        val candDf = broadcast(spark.createDataFrame(
          spark.sparkContext.parallelize(
            candidates.toIndexedSeq.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            keyed.schema(keyCol).copy(name = "__cand")))))
        keyed.join(candDf, col(keyCol) === col("__cand"), "left")
          .withColumn("__k", col("__cand"))
      }
    val grouped = marked.groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("cnt"))
    val all = grouped.collect()
    val n = all.map(_.getLong(1)).sum
    val keyOrd: Any => (Long, String, Long) = key => key match {
      case s: String => (0L, s, 0L)
      case l: Long => (0L, "", l)
      case other => throw new IllegalStateException(s"unexpected key $other")
    }
    val top = all.filter(!_.isNullAt(0))
      .sortBy(r => { val (_, s, l) = keyOrd(r.get(0)); (-r.getLong(1), s, l) })
      .take(m)
    if (anyOverflow) {
      // certificate: the m-th exact count must beat the maximum
      // frequency a non-candidate key could hide at.
      val mth = if (top.length >= m) top(m - 1).getLong(1) else 0L
      require(mth > n / (k + 1),
        s"top-$m not certifiable: m-th count $mth ≤ N/(k+1) = ${n / (k + 1)} " +
          s"(N=$n, k=$k) — a non-candidate key could outrank it; raise k")
    }
    // ≤ m rows, already materialized for the certificate — hand them
    // back without re-running the recount.
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.toIndexedSeq, 1), grouped.schema)
  }
}
