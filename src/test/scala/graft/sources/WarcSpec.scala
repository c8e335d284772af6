package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.text.HtmlText

/** WARC source + HTML text extraction: record round-trips (plain and
  * member-per-record gzip), HTTP payload splitting, torn-record
  * refusal, and the extraction rules the crawl text stack depends
  * on. */
class WarcSpec extends SparkSpec {

  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sampleRecords(n: Int): Seq[Warc.Record] =
    (0 until n).flatMap { i =>
      Seq(
        Warc.Record("", "request", s"https://example.org/doc/$i",
          "2026-08-17T00:00:00Z", "application/http; msgtype=request",
          s"GET /doc/$i HTTP/1.1\r\nHost: example.org\r\n\r\n"
            .getBytes("UTF-8")),
        Warc.Record("", "response", s"https://example.org/doc/$i",
          "2026-08-17T00:00:00Z", "application/http; msgtype=response",
          Warc.httpResponse(s"<html><body><p>doc $i</p></body></html>"
            .getBytes("UTF-8"))))
    }

  test("plain WARC round-trips every record byte-exactly") {
    val dir = tmpDir("warc-plain")
    Warc.writeWarc(fs(dir), new Path(s"$dir/a.warc"), sampleRecords(5),
      gzipPerRecord = false)
    val back = Warc.readRecords(spark, dir).collect()
    assert(back.length == 10)
    assert(back.count(_.getString(1) == "response") == 5)
    val r3 = back.find(r => r.getString(1) == "response" &&
      r.getString(2).endsWith("/3")).get
    val payload = Warc.httpPayload(r3.getAs[Array[Byte]]("content"))
    assert(new String(payload, "UTF-8")
      .contains("<p>doc 3</p>"))
  }

  test("member-per-record gzip (the Common Crawl convention) streams through") {
    val dir = tmpDir("warc-gz")
    Warc.writeWarc(fs(dir), new Path(s"$dir/a.warc.gz"), sampleRecords(7),
      gzipPerRecord = true)
    val back = Warc.readRecords(spark, dir)
    assert(back.count() == 14)
    assert(back.filter("record_type = 'response'").count() == 7)
  }

  test("a torn record refuses loudly") {
    val dir = tmpDir("warc-torn")
    Warc.writeWarc(fs(dir), new Path(s"$dir/a.warc"), sampleRecords(2),
      gzipPerRecord = false)
    val whole = {
      val in = fs(dir).open(new Path(s"$dir/a.warc"))
      try in.readAllBytes() finally in.close()
    }
    val out = fs(dir).create(new Path(s"$dir/a.warc"), true)
    try out.write(whole, 0, whole.length - 30) finally out.close()
    intercept[org.apache.spark.SparkException] {
      Warc.readRecords(spark, dir).count(): Unit
    }
  }

  test("httpPayload splits the header block; headerless bodies pass whole") {
    val body = Warc.httpResponse("payload!".getBytes("UTF-8"))
    assert(new String(Warc.httpPayload(body), "UTF-8") == "payload!")
    val raw = "no headers here".getBytes("UTF-8")
    assert(Warc.httpPayload(raw).sameElements(raw))
  }

  test("HTML extraction: tags, entities, dropped elements, collapse") {
    val html = """<html><head><title>T</title><style>b{color:red}</style>
      |</head><body><h1>Head&amp;line</h1>
      |<script>var x = "<p>not text</p>";</script>
      |<p>first   paragraph</p><p>a &lt;b&gt; &#65;&#x42;</p>
      |<!-- a comment --><div>last</div></body></html>""".stripMargin
    val text = HtmlText.extract(html)
    assert(!text.contains("not text") && !text.contains("color"))
    assert(!text.contains("T\n"), "title contents are dropped")
    assert(text.contains("Head&line"))
    assert(text.contains("first paragraph"), s"collapsed: '$text'")
    assert(text.contains("a <b> AB"))
    assert(text.endsWith("last"))
    assert(HtmlText.title(html) == "T")
    // unclosed tag degrades (swallows to EOF) instead of throwing
    assert(HtmlText.extract("ok <div unclosed") == "ok")
    assert(HtmlText.extract(null) == "")
  }

  test("escaped text survives wrap -> extract exactly") {
    val original = "the quick brown fox jumps over the lazy dog"
    val escaped = original.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val html = s"<html><body><p>$escaped</p></body></html>"
    assert(HtmlText.extract(html) == original)
  }
}
