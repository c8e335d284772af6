package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tar-shard (WebDataset-convention) source/sink: member round-trips,
  * the sample-adjacency invariant (one key never straddles shards),
  * first-dot key/ext split, gzip shards, sample grouping. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def membersDf(n: Int) =
    (0L until n.toLong).flatMap { id =>
      val key = f"$id%06d"
      Seq((key, "txt", s"text of doc $id ".repeat(20).getBytes("UTF-8")),
        (key, "json", s"""{"id":$id}""".getBytes("UTF-8")))
    }.toDF("key", "ext", "content")

  test("write -> read round-trips every member byte-exactly") {
    val dir = tmpDir("shards-rt")
    val stats = TarShards.writeShards(membersDf(100), dir,
      maxShardBytes = 4096, numPartitions = 3)
    assert(stats.members == 200)
    assert(stats.shards >= 3, s"expected several shards, got ${stats.shards}")
    val back = TarShards.readMembers(spark, dir)
    assert(back.count() == 200)
    // byte-exact: join on (key, ext) and compare contents
    val src = membersDf(100).withColumnRenamed("content", "expected")
    assert(back.join(src, Seq("key", "ext"))
      .filter(col("content") =!= col("expected")).count() == 0)
  }

  test("a sample's members never straddle shards") {
    val dir = tmpDir("shards-adj")
    TarShards.writeShards(membersDf(200), dir,
      maxShardBytes = 2048, numPartitions = 4)
    val spread = TarShards.readMembers(spark, dir)
      .groupBy("key").agg(countDistinct("shard").as("n"))
      .filter(col("n") =!= 1).count()
    assert(spread == 0)
    // every key present exactly twice (txt + json)
    assert(TarShards.readMembers(spark, dir).groupBy("key").count()
      .filter(col("count") =!= 2).count() == 0)
  }

  test("samples() groups all of a key's members into one row") {
    val dir = tmpDir("shards-smp")
    TarShards.writeShards(membersDf(50), dir, maxShardBytes = 4096)
    val s = TarShards.samples(TarShards.readMembers(spark, dir))
    assert(s.count() == 50)
    assert(s.filter(size(col("exts")) =!= 2).count() == 0)
    val row = s.filter(col("key") === "000007")
      .select(element_at(col("exts"), "json")).as[Array[Byte]].head()
    assert(new String(row, "UTF-8") == """{"id":7}""")
  }

  test("gzip shards round-trip") {
    val dir = tmpDir("shards-gz")
    TarShards.writeShards(membersDf(30), dir, maxShardBytes = 4096,
      gzip = true)
    val names = TarShards.readMembers(spark, dir)
      .select("shard").distinct().as[String].collect()
    assert(names.nonEmpty && names.forall(_.endsWith(".tar.gz")))
    assert(TarShards.readMembers(spark, dir).count() == 60)
  }

  test("WebDataset key split is at the FIRST dot") {
    val dir = tmpDir("shards-dot")
    val df = Seq(("000001", "seg.png", "abc".getBytes("UTF-8")),
      ("000001", "txt", "x".getBytes("UTF-8")))
      .toDF("key", "ext", "content")
    TarShards.writeShards(df, dir)
    val back = TarShards.readMembers(spark, dir)
      .select("key", "ext").as[(String, String)].collect().toSet
    assert(back == Set(("000001", "seg.png"), ("000001", "txt")))
  }

  test("a directory without shards refuses loudly") {
    val dir = tmpDir("shards-empty")
    intercept[IllegalArgumentException] {
      TarShards.readMembers(spark, dir)
    }
  }
}
