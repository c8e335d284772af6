package graft.streaming

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType, TimestampType}

import graft.{SparkSpec, Tables}
import graft.operators.Funnel

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("stream depths equal batch Funnel.depth on real events") {
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    // split into 3 event-time ranges: per-user cross-batch ts order holds
    val in = tmpDir("sfun-in")
    val parts = Seq(
      ev.orderBy("ts", "event_id").limit(300),
      ev.orderBy("ts", "event_id").limit(700).exceptAll(
        ev.orderBy("ts", "event_id").limit(300)),
      ev.exceptAll(ev.orderBy("ts", "event_id").limit(700)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = s"$in/f$i"
      p.coalesce(1).write.parquet(d)
      new File(d).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val stream = Streams.fileReplay(spark, s"$in/*", schema)
    val out = StreamFunnel.depths(stream, "user_id", "ts", "event_type",
      stages, "event_id")
    val q = out.writeStream.format("memory").queryName("sfun")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // depth is monotone per key, so the final state is the max emission
    val rows = spark.sql("SELECT key, max(depth) AS depth FROM sfun GROUP BY key")
      .collect().map(r => r.getString(0).toLong -> r.getInt(1).toLong).toMap
    val want = Funnel.depth(ev, "user_id", "ts", "event_type", stages,
        "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == want)
  }

  test("state carries across batches: stages certified in separate batches") {
    val in = tmpDir("sfun2-in")
    val batches = Seq(
      Seq((1L, 10L, 7L, "view", 0.0)),
      Seq((2L, 20L, 7L, "click", 0.0)),
      Seq((3L, 30L, 7L, "purchase", 0.0)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val d = s"$in/f$i"
      rows.toDF("event_id", "t", "user_id", "event_type", "value")
        .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(d)
      new File(d).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val stream = Streams.fileReplay(spark, s"$in/*", schema)
    val out = StreamFunnel.depths(stream, "user_id", "ts", "event_type",
      stages, "event_id")
    val q = out.writeStream.format("memory").queryName("sfun2")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val depths = spark.sql("SELECT depth FROM sfun2")
      .collect().map(_.getInt(0)).toSeq.sorted
    // one emission per batch for the single key: 1 then 2 then 3
    assert(depths == Seq(1, 2, 3))
  }
}
