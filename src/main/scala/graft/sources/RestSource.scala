package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REST-style paginated ingestion: a driver-side pagination loop pulls
  * JSON pages through a pluggable fetcher until the cursor ends, spilling
  * every `flushEveryPages` pages to a staged JSON-lines chunk; the chunks
  * then parse as one distributed read.
  *
  * Reference: RestApiExtractor
  * (gobblin-core/.../extract/restapi/RestApiExtractor.java:61) — the
  * extractor loops `getNextUrl`/page fetch on the task thread and yields
  * JSON records; pagination state (cursor/offset) lives in the extractor,
  * exactly like `fetch` here. The sandbox has no network, so the fetcher
  * is the seam where an HTTP client plugs in; tests drive it with an
  * in-memory endpoint.
  *
  * Scale notes: pagination is inherently sequential per endpoint (the
  * cursor is a data dependency) — same as the reference; parallelism
  * comes from planning MANY endpoints/chunks (e.g. one fetcher per
  * histogram chunk, see [[graft.planning.WatermarkPartitioner
  * .packHistogram]]). Driver memory is O(flushEveryPages × page) — a
  * million-record backfill through one endpoint streams through the
  * driver, it never accumulates there — and the JSON decode runs
  * distributed over the staged chunks.
  */
object RestSource {

  /** One page: raw JSON records + the next cursor (None = done). */
  final case class Page(records: Seq[String], next: Option[Long])

  /** A real HTTP fetcher for [[read]]'s seam: GET `pageUrl(cursor)` with
    * the sinks' bounded retry (5xx/429/connect errors), then parse the
    * standard paged-JSON envelope — a records array field plus a
    * next-cursor field that is a number while pages remain and
    * null/absent on the last page (the RestApiExtractor.getNextUrl
    * contract). Auth/header/timeout knobs ride the shared HttpConfig.
    *
    * Driver-side by design, like the pagination loop itself: the cursor
    * chain is a data dependency, so one endpoint = one sequential
    * fetcher; scale comes from planning many endpoints/chunks. */
  def httpFetcher(pageUrl: Long => String,
                  recordsField: String = "records",
                  nextField: String = "next",
                  http: graft.sinks.HttpSink.HttpConfig =
                    graft.sinks.HttpSink.HttpConfig(url = "")): Long => Page = {
    val client = java.net.http.HttpClient.newHttpClient()
    cursor => {
      val body = graft.sinks.HttpSink.get(client,
        http.copy(url = pageUrl(cursor)))
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(body)
      def compact(v: JValue): String =
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(v))
      val records = j \ recordsField match {
        case JArray(items) => items.map(compact)
        case JNothing | JNull => Seq.empty
        case single => Seq(compact(single))
      }
      val next = j \ nextField match {
        case JInt(n) => Some(n.toLong)
        case JLong(n) => Some(n)
        case JDecimal(n) => Some(n.toLong)
        case JDouble(n) => Some(n.toLong)
        case JString("") => None // Slack-style "next_cursor": "" terminator
        case JString(s) => // numeric cursors often arrive JSON-quoted;
          // anything else must fail LOUDLY, not truncate to one page
          Some(s.toLongOption.getOrElse(throw new IllegalArgumentException(
            s"non-numeric '$nextField' cursor: '$s' — plug a custom fetcher " +
              "for opaque-cursor APIs")))
        case JBool(false) => None // "has more" flag style terminator
        case JNothing | JNull => None
        case other => throw new IllegalArgumentException(
          s"unexpected '$nextField' cursor shape: $other")
      }
      Page(records, next)
    }
  }

  /** Pull all pages starting at cursor 0, parse as JSON rows.
    *
    * `stagingDir` (default: a fresh dir under java.io.tmpdir) holds the
    * spilled chunks; it must outlive the returned (lazy) DataFrame. */
  def read(spark: SparkSession, fetch: Long => Page,
           schema: Option[StructType] = None,
           maxPages: Int = 100000,
           flushEveryPages: Int = 64,
           stagingDir: Option[String] = None): DataFrame = {
    require(flushEveryPages > 0)
    val dir = new Path(stagingDir.getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft-rest-${java.util.UUID.randomUUID()}"))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)

    var buf = Vector.newBuilder[String]
    var bufPages = 0
    var chunks = 0
    def flush(): Unit = if (bufPages > 0) {
      val out = fs.create(new Path(dir, f"chunk-$chunks%05d.jsonl"), true)
      try buf.result().foreach { r =>
        // valid JSON holds raw newlines only as insignificant whitespace
        // BETWEEN tokens (in-string newlines must be \n-escaped), so
        // flattening them preserves the record while keeping 1 line = 1 row
        out.write(r.replace('\n', ' ').replace('\r', ' ').getBytes("UTF-8"))
        out.write('\n')
      } finally out.close()
      chunks += 1; buf = Vector.newBuilder[String]; bufPages = 0
    }

    var cursor: Option[Long] = Some(0L)
    var pages = 0
    while (cursor.isDefined) {
      require(pages < maxPages, s"pagination did not terminate in $maxPages pages")
      val page = fetch(cursor.get)
      buf ++= page.records
      cursor = page.next
      pages += 1
      bufPages += 1
      if (bufPages >= flushEveryPages) flush()
    }
    flush()

    if (chunks == 0) { // empty extract: preserve the no-data contract
      import spark.implicits._
      val reader = schema.fold(spark.read)(s => spark.read.schema(s))
      reader.json(spark.createDataset(Seq.empty[String]))
    } else {
      val reader = schema.fold(spark.read)(s => spark.read.schema(s))
      reader.json(dir.toString)
    }
  }
}
