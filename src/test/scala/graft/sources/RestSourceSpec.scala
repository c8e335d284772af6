package graft.sources

import graft.SparkSpec
import graft.planning.WatermarkPartitioner

class RestSourceSpec extends SparkSpec {

  test("pagination loop drains the cursor and parses records") {
    // fake endpoint: 25 records served 10 per page
    val all = (0 until 25).map(i => s"""{"id":$i,"v":"r$i"}""")
    def fetch(offset: Long): RestSource.Page = {
      val page = all.slice(offset.toInt, offset.toInt + 10)
      RestSource.Page(page,
        if (offset + 10 < all.size) Some(offset + 10) else None)
    }
    val df = RestSource.read(spark, fetch)
    assert(df.count() == 25)
    assert(df.columns.sorted.toSeq == Seq("id", "v"))
    import spark.implicits._
    assert(df.select("id").as[Long].collect().toSet == (0L until 25L).toSet)
  }

  test("long backfills spill every N pages: driver holds O(N pages), chunks decode distributed") {
    val staging = tmpDir("rest-chunks")
    val nPages = 120
    val perPage = 5
    def fetch(offset: Long): RestSource.Page = {
      val p = offset.toInt
      RestSource.Page(
        (0 until perPage).map(i => s"""{"id":${p * perPage + i}}"""),
        if (p + 1 < nPages) Some(p + 1) else None)
    }
    val df = RestSource.read(spark, fetch, flushEveryPages = 8,
      stagingDir = Some(staging))
    // 120 pages at flush-every-8 must leave ceil(120/8)=15 chunk files —
    // proof the builder was drained every 8 pages, never grew past them
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chunkFiles = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath.getName).filter(_.startsWith("chunk-"))
    assert(chunkFiles.length == 15, chunkFiles.mkString(","))
    import spark.implicits._
    assert(df.select("id").as[Long].collect().toSet ==
      (0L until (nPages * perPage).toLong).toSet)
    // records with embedded formatting newlines survive the line spill
    val multi = RestSource.read(spark,
      _ => RestSource.Page(Seq("{\n  \"id\": 1,\n  \"s\": \"a\\nb\"\n}"), None),
      flushEveryPages = 1, stagingDir = Some(tmpDir("rest-multiline")))
    val row = multi.select("id", "s").as[(Long, String)].head
    assert(row == ((1L, "a\nb")))
  }

  test("runaway pagination is bounded") {
    intercept[IllegalArgumentException] {
      RestSource.read(spark, _ => RestSource.Page(Seq("{}"), Some(0L)),
        maxPages = 5)
    }
  }

  test("histogram packing yields equi-depth chunks (salesforce-style planning)") {
    // bursty per-day counts: equal-width would put 900 rows in one chunk
    val hist = Seq("d1" -> 10L, "d2" -> 900L, "d3" -> 20L, "d4" -> 30L,
      "d5" -> 40L, "d6" -> 500L)
    val chunks = WatermarkPartitioner.packHistogram(hist, targetRowsPerChunk = 500)
    assert(chunks == Seq(("d1", "d1"), ("d2", "d2"), ("d3", "d5"), ("d6", "d6")))
    // degenerate cases
    assert(WatermarkPartitioner.packHistogram(Nil, 10) == Nil)
    assert(WatermarkPartitioner.packHistogram(Seq("x" -> 999L), 10) ==
      Seq(("x", "x")))
  }
}
