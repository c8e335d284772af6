package graft.streaming

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.SparkSpec
import graft.operators.DriftCheck

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("v", DoubleType)))

  private def writeArrivals(inDir: String, batches: Seq[Seq[Double]]): Unit =
    batches.zipWithIndex.foreach { case (rows, i) =>
      val d = s"$inDir/f$i"
      rows.toDF("v").coalesce(1).write.parquet(d)
      new File(d).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }

  test("drift rises when the stream's shape departs from the reference") {
    val in = tmpDir("sd-in"); val state = tmpDir("sd-state")
    val ref = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    // batches 0-1 match the reference shape; batch 2 collapses to one bin
    writeArrivals(in, Seq(
      (1 to 50).map(i => (i % 10).toDouble),
      (1 to 50).map(i => (i % 10).toDouble),
      Seq.fill(200)(3.0)))
    val q = StreamingDrift.start(
      Streams.fileReplay(spark, s"$in/*", schema), "floor(v)", ref,
      state, tmpDir("sd-ck"))
    q.awaitTermination()
    val series = StreamingDrift.series(spark, state)
      .collect().map(r => (r.getAs[Number]("batch_id").longValue,
        r.getAs[Long]("rows_seen"), r.getAs[Long]("tv_permille")))
    assert(series.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(series(0)._3 == 0L && series(1)._3 == 0L,
      s"matching shape must score 0: ${series.toSeq}")
    assert(series(2)._3 > 400L,
      s"the collapsed batch must spike the score: ${series.toSeq}")
    assert(series(2)._2 == 300L, "cumulative rows fold across batches")
  }

  test("fold equals the batch gate over the union; replay is idempotent") {
    val state = tmpDir("sd2-state")
    val ref = (1 to 60).map(i => (i % 6).toDouble).toDF("v")
    val refCounts = ref.selectExpr("floor(v) AS bin")
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val b0 = (1 to 30).map(i => (i % 3).toDouble).toDF("v")
    val b1 = (1 to 30).map(i => (i % 7).toDouble).toDF("v")
    StreamingDrift.step(spark, b0, 0L, "floor(v)", refCounts, state)
    StreamingDrift.step(spark, b1, 1L, "floor(v)", refCounts, state)
    val streamed = StreamingDrift.series(spark, state)
      .filter(col("batch_id") === 1).collect()(0).getAs[Long]("tv_permille")
    val direct = DriftCheck.tvDrift(
        b0.unionByName(b1).selectExpr("floor(v) AS bin"),
        ref.selectExpr("floor(v) AS bin"), "bin")
      .collect()(0).getAs[Long]("tv_permille")
    assert(streamed == direct,
      "cumulative fold must equal the batch gate on the union")
    // replay batch 1: byte-identical state and series
    val before = spark.read.parquet(s"$state/counts/batch_id=1")
      .collect().map(_.toSeq).toSet
    StreamingDrift.step(spark, b1, 1L, "floor(v)", refCounts, state)
    val after = spark.read.parquet(s"$state/counts/batch_id=1")
      .collect().map(_.toSeq).toSet
    assert(before == after)
    // counts dir bounded to the last two snapshots
    StreamingDrift.step(spark, b0, 2L, "floor(v)", refCounts, state)
    val dirs = new File(s"$state/counts").listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs == Set("batch_id=1", "batch_id=2"))
  }
}
