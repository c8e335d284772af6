package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def writeBase(dir: String) = {
    val base = Seq(
      (1L, "a", "p1"), (2L, "b", "p1"),
      (3L, "c", "p2"), (4L, "d", "p2"),
      (5L, "e", "p3")).toDF("k", "v", "p")
    base.write.mode("overwrite").partitionBy("p").parquet(dir)
    base
  }

  test("merged frame: upserts replace, deletes vanish, untouched rows stay") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B2", "U"), (3L, "x", "D"), (9L, "new", "U")).toDF("k", "v", "op")
    val out = Merge.merged(base, changes, Seq("k"), col("op") === "D")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 9L -> "new"))
  }

  test("merged frame: delta picks the LATEST change per key") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq(
      (1L, "older", "U", 10L), (1L, "newest", "U", 20L),
      (2L, "dead", "D", 5L), (2L, "alive", "U", 9L)) // latest for 2 is U
      .toDF("k", "v", "op", "seq")
    val out = Merge.merged(base, changes, Seq("k"), col("op") === "D",
      delta = Seq(col("seq").desc))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "newest", 2L -> "alive"))
  }

  test("mergePartitioned rewrites only affected partitions, verifies, and is idempotent") {
    val dir = tmpDir("merge-cow")
    writeBase(dir)
    val p3Before = new java.io.File(s"$dir/p=p3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    val changes = Seq(
      (2L, "B2", "p1", "U"),   // in-place update in p1
      (3L, "c", "p2", "D"),    // delete from p2
      (4L, "d4", "p9", "U"),   // MOVE: p2 -> brand-new partition p9
      (9L, "i", "p1", "U"))    // insert into p1
      .toDF("k", "v", "p", "op")
    val stats = Merge.mergePartitioned(spark, dir, "p", changes,
      Seq("k"), col("op") === "D")
    assert(stats.affected.map(String.valueOf).toSet == Set("p1", "p2", "p9"))
    val after = spark.read.parquet(dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(after == Map(
      1L -> ("a", "p1"), 2L -> ("B2", "p1"), 9L -> ("i", "p1"),
      4L -> ("d4", "p9"), 5L -> ("e", "p3")))
    // p3 was never rewritten: same physical files
    val p3After = new java.io.File(s"$dir/p=p3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    assert(p3After.toSeq == p3Before.toSeq, "untouched partition must keep its files")
    // re-applying the same changelog is a no-op on content
    Merge.mergePartitioned(spark, dir, "p", changes, Seq("k"), col("op") === "D")
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("a fully-deleted partition is removed outright") {
    val dir = tmpDir("merge-drop-part")
    writeBase(dir)
    val changes = Seq((3L, "c", "p2", "D"), (4L, "d", "p2", "D"))
      .toDF("k", "v", "p", "op")
    val stats = Merge.mergePartitioned(spark, dir, "p", changes,
      Seq("k"), col("op") === "D")
    assert(stats.removedPartitions.map(String.valueOf) == Seq("p2"))
    assert(!new java.io.File(s"$dir/p=p2").exists())
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("real-data merge equals the frame-level merged() result") {
    val dir = tmpDir("merge-real")
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"))
    ev.write.mode("overwrite").partitionBy("dt").parquet(dir)
    val changes = ev.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") * 2)
      .withColumn("op", when(col("event_id") % 10 === 0, "D").otherwise("U"))
    Merge.mergePartitioned(spark, dir, "dt", changes,
      Seq("event_id"), col("op") === "D")
    val got = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("value")).head()
    val want = Merge.merged(ev, changes, Seq("event_id"), col("op") === "D")
      .agg(count(lit(1)), sum("value")).head()
    assert(got.getLong(0) == want.getLong(0))
    assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)
  }

  test("an oversized changelog takes the shuffle path bit-identically") {
    // maxBroadcastKeys=1 forces every join onto the shuffle fallback —
    // the result must equal the broadcast path's row for row
    def runWith(dir: String, maxKeys: Long): Set[String] = {
      writeBase(dir)
      val changes = Seq(
        (2L, "B2", "p1", "U"), (3L, "x", "p2", "D"), (9L, "new", "p3", "U"))
        .toDF("k", "v", "p", "op")
      Merge.mergePartitioned(spark, dir, "p", changes, Seq("k"),
        col("op") === "D", maxBroadcastKeys = maxKeys)
      spark.read.parquet(dir).collect()
        .map(r => s"${r.getAs[Long]("k")}|${r.getAs[String]("v")}|${r.getAs[String]("p")}")
        .toSet
    }
    val shuffleDir = tmpDir("merge-shuffle")
    val viaBroadcast = runWith(tmpDir("merge-bcast"), maxKeys = 5000000L)
    val viaShuffle = runWith(shuffleDir, maxKeys = 1L)
    assert(viaShuffle == viaBroadcast, "fallback path must not change results")
    // and the hint really is absent: the anti-join plan under the tiny
    // threshold must not carry a broadcast exchange on the change side
    val base = spark.read.parquet(shuffleDir)
    val ch = Seq((2L, "B2", "p1", "U")).toDF("k", "v", "p", "op")
    val plan = Merge.merged(base, ch, Seq("k"), col("op") === "D",
      broadcastChangeKeys = false).queryExecution.optimizedPlan.toString
    assert(!plan.contains("broadcast"), s"no broadcast hint expected:\n$plan")
  }
}
