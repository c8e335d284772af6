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
