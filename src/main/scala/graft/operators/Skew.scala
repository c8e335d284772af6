package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the hot side, replicate the other.
  *
  * A shuffled join puts every row of one key into one task; a hot key
  * (null-ish defaults, a mega-customer, boilerplate content) turns that
  * task into the job's straggler. Salting scatters the hot side across
  * `salts` sub-keys and replicates the other side once per sub-key, so
  * the hot key runs on `salts` tasks — result identical to the plain
  * join.
  *
  * When to reach for this instead of the built-ins:
  *   - AQE's skew-join (spark.sql.adaptive.skewJoin) already splits
  *     oversized SORT-MERGE partitions at runtime — prefer it when it
  *     applies (it is on in this engine's sessions).
  *   - broadcast() beats salting whenever the small side fits in memory.
  *   - Salting remains the tool when AQE can't see the skew (stream-static
  *     joins, aggregate-after-join pipelines where the straggler is the
  *     downstream agg, or engines/configs without AQE) — and it composes
  *     with bucketing (salt the bucket key at write time).
  *
  * The replicated side grows `salts`×: size `salts` to the straggler
  * ratio (hot-key rows / average-task rows), not higher.
  */
object Skew {

  /** Per-row salt in [0, salts): deterministic-given-layout, uniform, and
    * independent of the data values (a value-derived salt would re-skew). */
  private def rowSalt(salts: Int): Column =
    pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
      lit(salts.toLong)).cast("int")

  /** Inner/left join of a skewed `fact` against `dim` on fact.factKey =
    * dim.dimKey, salted `salts` ways. Every fact row carries one salt;
    * every dim row is replicated to all salts; the join key becomes
    * (key, salt). Output columns = fact ++ dim (dimKey dropped), exactly
    * as the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer")(joinType),
      s"salted join supports inner/left (fact side preserved), not $joinType")
    val f = fact.withColumn("__graft_salt", rowSalt(salts))
    val d = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // dataframe-qualified refs: factKey and dimKey may share a name
    f.join(d, f("__graft_salt") === d("__graft_salt") &&
        f(factKey) === d(dimKey), joinType)
      .drop(d(dimKey)).drop(f("__graft_salt")).drop(d("__graft_salt"))
  }

  /** The keys of `df` carrying more than `maxRows` rows — the straggler
    * candidates. One combiner-reduced aggregation; output is by
    * definition small (at most total/maxRows keys). */
  def hotKeys(df: DataFrame, keyCol: String, maxRows: Long): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > maxRows)
  }

  /** Skew-split join: fact rows on HOT keys (> `hotKeyMaxRows` rows each)
    * join a broadcast slice of `dim` restricted to those keys; everything
    * else takes the plain shuffled join; the union is EXACTLY the
    * unsalted join. This beats [[saltedJoin]] when the dim side is too
    * big to replicate salts× but the hot SLICE of it is tiny (the usual
    * case: a handful of mega-keys) — the hot keys never enter the
    * shuffle at all, so there is no straggler task to split.
    *
    * Hot keys are detected with one exact count aggregation and inlined
    * as NATIVE-typed `isin` literals (string-casting would diverge from
    * join equality on floats and mixed types — both key columns must
    * share one data type, enforced loudly); `maxHotKeys` guards against
    * a threshold so low the "hot set" is half the corpus — that's not
    * skew, that's the join, and inlining it would blow up the plan.
    *
    * A hot NULL key — the archetypal real-world straggler — never needs
    * the dim at all (SQL null equals nothing): null fact rows BYPASS
    * both joins entirely, null-padded into a left join's output and
    * dropped from an inner join's. They cost a scan, never a shuffle.
    * Eager: the detection aggregation runs when called. */
  def splitSkewJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, hotKeyMaxRows: Long,
                    joinType: String = "inner",
                    maxHotKeys: Int = 10000): DataFrame = {
    require(Set("inner", "left", "left_outer")(joinType),
      s"split join supports inner/left (fact side preserved), not $joinType")
    val (ft, dt) = (fact.schema(factKey).dataType, dim.schema(dimKey).dataType)
    require(ft == dt,
      s"fact.$factKey: $ft and dim.$dimKey: $dt differ — cast one side " +
        "first so hot-set membership and join equality cannot disagree")
    val hot = hotKeys(fact, factKey, hotKeyMaxRows)
      .filter(col(factKey).isNotNull) // nulls take the bypass, not a join
      .limit(maxHotKeys + 1).select(col(factKey)).collect().map(_.get(0))
    require(hot.length <= maxHotKeys,
      s"more than $maxHotKeys hot keys at threshold $hotKeyMaxRows — " +
        "this is general cardinality, not skew; raise the threshold")
    val nullRows = fact.filter(col(factKey).isNull)
    val nonNull = fact.filter(col(factKey).isNotNull)
    val joined =
      if (hot.isEmpty)
        nonNull.join(dim, nonNull(factKey) === dim(dimKey), joinType)
          .drop(dim(dimKey))
      else {
        def isHot(c: Column) = c.isin(hot.toIndexedSeq: _*)
        val (fh, dh) = (nonNull.filter(isHot(col(factKey))),
          dim.filter(isHot(col(dimKey))))
        val hotJoin = fh.join(broadcast(dh),
          fh(factKey) === dh(dimKey), joinType).drop(dh(dimKey))
        val (fc, dc) = (nonNull.filter(!isHot(col(factKey))),
          dim.filter(!isHot(col(dimKey)) || col(dimKey).isNull))
        val coldJoin = fc.join(dc, fc(factKey) === dc(dimKey), joinType)
          .drop(dc(dimKey))
        hotJoin.unionByName(coldJoin)
      }
    if (joinType == "inner") joined
    else {
      val padded = dim.columns.filterNot(_ == dimKey).foldLeft(nullRows) {
        (d, c) => d.withColumn(c, lit(null).cast(dim.schema(c).dataType))
      }
      joined.unionByName(padded)
    }
  }
}
