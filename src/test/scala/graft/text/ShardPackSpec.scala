package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ShardPackSpec extends SparkSpec {
  import spark.implicits._

  /** The semantics in one line: a single global window (the thing the
    * distributed version must never run at scale). */
  private def naive(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    val h = TextStats.portableHash60(
      concat(lit("shard"), col("id").cast("string")))
    df.withColumn("__h", h)
      .withColumn("cum_before", coalesce(
        sum(col("w")).over(Window.orderBy(col("__h"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", expr(s"cum_before div ${budget}L"))
      .drop("__h")
  }

  test("matches the single-window definition exactly") {
    val df = spark.range(1000).toDF("id")
      .withColumn("w", (col("id") % 97 + 1).cast("long"))
    val got = ShardPack.packByBudget(df, "id", "w", budget = 500, buckets = 8)
      .select("id", "w", "cum_before", "shard_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = naive(df, 500)
      .select("id", "w", "cum_before", "shard_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("output is invariant to the bucket count") {
    val df = spark.range(300).toDF("id").withColumn("w", lit(10L))
    def run(b: Int) =
      ShardPack.packByBudget(df, "id", "w", budget = 100, buckets = b)
        .select("id", "shard_id").as[(Long, Long)].collect().toSet
    assert(run(1) == run(7))
    assert(run(7) == run(4096))
  }

  test("every shard except the last closes at >= budget; docs never split") {
    val df = spark.range(500).toDF("id")
      .withColumn("w", (col("id") % 40 + 1).cast("long"))
    val out = ShardPack.packByBudget(df, "id", "w", budget = 300, buckets = 16)
    val perShard = out.groupBy("shard_id").agg(sum("w").as("tot"))
      .as[(Long, Long)].collect().toMap
    val last = perShard.keys.max
    // a shard closes when the running total crosses its boundary, and an
    // overshooting doc stays whole (borrowing from the next shard's
    // budget) — so the invariant is CUMULATIVE: through shard k the
    // corpus has consumed at least (k+1) budgets
    var cum = 0L
    (0L to last).foreach { s =>
      cum += perShard(s)
      if (s != last) assert(cum >= 300 * (s + 1),
        s"cumulative total through shard $s under budget: $cum")
    }
    // shard ids are dense from 0
    assert(perShard.keys.toSeq.sorted == (0L to last).toSeq)
  }

  test("startOffset continues the shard sequence across batches (incremental append)") {
    val all = spark.range(400).toDF("id")
      .withColumn("w", (col("id") % 50 + 1).cast("long"))
    val batch1 = all.filter(col("id") < 250)
    val batch2 = all.filter(col("id") >= 250)
    val p1 = ShardPack.packByBudget(batch1, "id", "w", budget = 700, buckets = 8)
    // committed total = max cum_before + that row's weight
    val committed = p1.select(max(col("cum_before") + col("w"))).as[Long].head()
    val p2 = ShardPack.packByBudget(batch2, "id", "w", budget = 700, buckets = 8,
      startOffset = committed)
    // batch 2 continues where batch 1 stopped: its first shard is batch
    // 1's last (possibly underfull) shard or the next one, never earlier
    val lastShard1 = p1.agg(max("shard_id")).as[Long].head()
    val firstShard2 = p2.agg(min("shard_id")).as[Long].head()
    assert(firstShard2 == lastShard1 || firstShard2 == lastShard1 + 1)
    // shard ids never collide on CONTENT: the combined weight through any
    // shared boundary shard still respects the budget law
    val perShard = p1.groupBy("shard_id").agg(sum("w").as("t"))
      .union(p2.groupBy("shard_id").agg(sum("w").as("t")))
      .groupBy("shard_id").agg(sum("t").as("tot"))
      .as[(Long, Long)].collect().toMap
    val last = perShard.keys.max
    var cum = 0L
    (0L to last).foreach { s =>
      cum += perShard.getOrElse(s, 0L)
      if (s != last) assert(cum >= 700 * (s + 1),
        s"cumulative total through shard $s under budget: $cum")
    }
  }

  test("null weights count as zero rather than poisoning the prefix sum") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "w")
    val out = ShardPack.packByBudget(df, "id", "w", budget = 100, buckets = 4)
    assert(out.count() == 3)
    assert(out.agg(max("cum_before")).as[Long].head() <= 15L)
  }

  test("the corpus-side window is partitioned by bucket, never global") {
    val df = spark.range(100).toDF("id").withColumn("w", lit(1L))
    val plan = ShardPack.packByBudget(df, "id", "w", budget = 10, buckets = 8)
      .queryExecution.executedPlan.toString
    // the big-side window must carry the bucket in its partition spec
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.exists(_.contains("__graft_b")),
      s"no bucket-partitioned window in:\n$plan")
    // and the offsets side joins back as a broadcast, not a shuffle
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"offsets join is not broadcast in:\n$plan")
  }
}
