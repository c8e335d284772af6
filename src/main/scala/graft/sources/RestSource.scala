package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REST-style paginated ingestion: a driver-side pagination loop pulls
  * JSON pages through a pluggable fetcher until the cursor ends, then the
  * accumulated records parse into a DataFrame.
  *
  * Reference: RestApiExtractor
  * (gobblin-core/.../extract/restapi/RestApiExtractor.java:61) — the
  * extractor loops `getNextUrl`/page fetch on the task thread and yields
  * JSON records; pagination state (cursor/offset) lives in the extractor,
  * exactly like `fetch` here. The sandbox has no network, so the fetcher
  * is the seam where an HTTP client plugs in; tests drive it with an
  * in-memory endpoint.
  *
  * Scale note: pagination is inherently sequential per endpoint (the
  * cursor is a data dependency) — same as the reference; parallelism
  * comes from planning MANY endpoints/chunks (e.g. one fetcher per
  * histogram chunk, see [[graft.planning.WatermarkPartitioner
  * .packHistogram]]) — and the JSON decode of fetched pages is
  * distributed.
  */
object RestSource {

  /** One page: raw JSON records + the next cursor (None = done). */
  final case class Page(records: Seq[String], next: Option[Long])

  /** Pull all pages starting at cursor 0, parse as JSON rows. */
  def read(spark: SparkSession, fetch: Long => Page,
           schema: Option[StructType] = None,
           maxPages: Int = 100000): DataFrame = {
    val buf = Vector.newBuilder[String]
    var cursor: Option[Long] = Some(0L)
    var pages = 0
    while (cursor.isDefined) {
      require(pages < maxPages, s"pagination did not terminate in $maxPages pages")
      val page = fetch(cursor.get)
      buf ++= page.records
      cursor = page.next
      pages += 1
    }
    import spark.implicits._
    val ds = spark.createDataset(buf.result())
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    reader.json(ds)
  }
}
