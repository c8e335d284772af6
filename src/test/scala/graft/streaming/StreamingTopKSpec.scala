package graft.streaming

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("key", StringType)))

  private def writeArrivals(inDir: String, batches: Seq[Seq[String]]): Unit =
    batches.zipWithIndex.foreach { case (rows, i) =>
      val part = s"$inDir/f$i"
      rows.toDF("key").coalesce(1).write.parquet(part)
      new File(part).listFiles().foreach(_.setLastModified(1000000L * (i + 1)))
    }

  private def run(inDir: String, stateDir: String, ckpt: String,
                  k: Int): Unit = {
    val stream = Streams.fileReplay(spark, s"$inDir/*", schema)
    StreamingTopK.start(stream, "key", k, stateDir, ckpt).awaitTermination()
  }

  test("small key domain: exact counts across batches, d stays 0") {
    val in = tmpDir("tk-in"); val state = tmpDir("tk-state")
    val batches = Seq(
      Seq.fill(30)("a") ++ Seq.fill(10)("b"),
      Seq.fill(5)("a") ++ Seq.fill(20)("c"),
      Seq.fill(7)("b"))
    writeArrivals(in, batches)
    run(in, state, tmpDir("tk-ck"), k = 16)
    val est = StreamingTopK.estimates(spark, state)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(est.mapValues(_._1).toMap == Map("a" -> 35L, "b" -> 17L, "c" -> 20L))
    assert(est.values.forall(_._2 == 0L), "no overflow → d must be 0")
  }

  test("planted heavy key survives a churning tail within the bound") {
    val in = tmpDir("tk2-in"); val state = tmpDir("tk2-state")
    // heavy key: 300 total; 600 singleton noise keys across 3 batches
    val batches = (0 until 3).map { b =>
      scala.util.Random.shuffle(
        Seq.fill(100)("hot") ++ (0 until 200).map(i => s"u$b-$i"))
    }
    writeArrivals(in, batches)
    run(in, state, tmpDir("tk2-ck"), k = 20)
    val rows = StreamingTopK.estimates(spark, state).collect()
    assert(rows.length <= 20, "state must stay bounded by k")
    val hot = rows.find(_.getString(0) == "hot")
    assert(hot.isDefined, "heavy key must survive the summary")
    val (est, d, n) = (hot.get.getLong(1), hot.get.getLong(3), hot.get.getLong(4))
    assert(n == 900L)
    assert(est <= 300L && est + d >= 300L,
      s"true count 300 outside [est=$est, est+d=${est + d}]")
    // and it ranks first
    assert(rows.maxBy(_.getLong(1)).getString(0) == "hot")
  }

  test("step replay overwrites identical state (exactly-once)") {
    val state = tmpDir("tk3-state")
    val b0 = (Seq.fill(50)("x") ++ (0 until 100).map(i => s"n$i")).toDF("key")
    val b1 = (Seq.fill(30)("x") ++ (0 until 80).map(i => s"m$i")).toDF("key")
    StreamingTopK.step(spark, b0, 0L, "key", 8, state)
    StreamingTopK.step(spark, b1, 1L, "key", 8, state)
    val first = spark.read.parquet(s"$state/batch_id=1")
      .collect().map(_.toSeq).toSet
    // replay batch 1 (at-least-once delivery): byte-identical fold
    StreamingTopK.step(spark, b1, 1L, "key", 8, state)
    val again = spark.read.parquet(s"$state/batch_id=1")
      .collect().map(_.toSeq).toSet
    assert(first == again)
    // old snapshots swept: only batch 0 and 1 remain
    val dirs = new File(state).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs == Set("batch_id=0", "batch_id=1"))
  }

  test("a state that decrements to empty still preserves the d bound") {
    val state = tmpDir("tk5-state")
    // k=2: batch 0 leaves {a:2, b:2}; batch 1 adds {c:2, d:2} → merged
    // 4 equal counts, MG-reduce subtracts the 3rd largest (2) and the
    // state wipes to EMPTY — d must still accumulate to 2, not reset
    StreamingTopK.step(spark,
      Seq("a", "a", "b", "b").toDF("key").coalesce(1), 0L, "key", 2, state)
    StreamingTopK.step(spark,
      Seq("c", "c", "d", "d").toDF("key").coalesce(1), 1L, "key", 2, state)
    val afterWipe = StreamingTopK.estimates(spark, state).collect()
    assert(afterWipe.isEmpty, "no key can be listed after the wipe")
    // the meta survived: a later batch reports d=2, not d=0
    StreamingTopK.step(spark,
      Seq("z").toDF("key").coalesce(1), 2L, "key", 2, state)
    val rows = StreamingTopK.estimates(spark, state).collect()
    assert(rows.length == 1)
    val (est, d, n) = (rows(0).getLong(1), rows(0).getLong(3),
      rows(0).getLong(4))
    assert(est == 1L && d == 2L && n == 9L,
      s"est=$est d=$d n=$n — the wipe's subtraction must persist in d")
  }

  test("undercount bound is honored against exact truth on skew") {
    val state = tmpDir("tk4-state")
    val data = Seq.fill(200)("h1") ++ Seq.fill(120)("h2") ++
      (0 until 500).map(i => s"z$i")
    val df = scala.util.Random.shuffle(data).toDF("key")
    StreamingTopK.step(spark, df, 0L, "key", 12, state)
    val est = StreamingTopK.estimates(spark, state).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val truth = Map("h1" -> 200L, "h2" -> 120L)
    truth.foreach { case (kk, true_c) =>
      est.get(kk).foreach { case (e, d) =>
        assert(e <= true_c && true_c <= e + d, s"$kk: $true_c vs [$e, ${e + d}]")
      }
    }
    assert(est.contains("h1"), "dominant key must survive")
  }
}
