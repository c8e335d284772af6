package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) source — the wire format web-scale
  * training corpora actually arrive in (Common Crawl ships petabytes
  * of `.warc.gz`): a file is a sequence of records, each a
  * `WARC/1.0` header block (named fields, `Content-Length` in bytes)
  * followed by that many body bytes and a blank-line separator; the
  * gzip convention is MEMBER-PER-RECORD, concatenated — which
  * `GZIPInputStream` walks transparently (it continues into the next
  * member), so one stream pass reads the whole file.
  *
  * Spark-first: one task streams one WARC file (read parallelism =
  * file count, zero driver bytes, no random access — object-store
  * friendly); `response` records expose their HTTP payload with the
  * header block split off. The writer is the fixture/interchange
  * face (records round-trip byte-exactly).
  */
object Warc {

  final case class Record(file: String, recordType: String,
                          targetUri: String, date: String,
                          contentType: String, content: Array[Byte])

  /** Read every record of every `.warc`/`.warc.gz` under `dir`:
    * (file, record_type, target_uri, date, content_type, content). */
  def readRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).filter(_.isFile).map(_.getPath.toString)
      .filter(p => p.endsWith(".warc") || p.endsWith(".warc.gz"))
      .sorted.toSeq
    require(files.nonEmpty, s"no .warc/.warc.gz files under $dir")
    spark.createDataset(files)
      .repartition(files.length)
      .mapPartitions { it =>
        val conf = hconf.value
        it.flatMap { filePath =>
          val p = new Path(filePath)
          val raw: InputStream = p.getFileSystem(conf).open(p)
          val in = new DataInputStream(
            if (filePath.endsWith(".gz"))
              new GZIPInputStream(new BufferedInputStream(raw))
            else new BufferedInputStream(raw))
          val name = p.getName
          Iterator.continually(readRecord(in, name))
            .takeWhile { r => if (r == null) { in.close(); false } else true }
            .map(r => (r.file, r.recordType, r.targetUri, r.date,
              r.contentType, r.content))
        }
      }.toDF("file", "record_type", "target_uri", "date", "content_type",
        "content")
  }

  /** One record off the stream; null at clean EOF, loud on a torn
    * record. */
  private def readRecord(in: DataInputStream, file: String): Record = {
    var line = readLine(in)
    // tolerate blank separators before the next header
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return null
    require(line.startsWith("WARC/"), s"expected a WARC version line, got '$line'")
    val headers = scala.collection.mutable.HashMap.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val colon = h.indexOf(':')
      require(colon > 0, s"malformed WARC header '$h'")
      headers(h.substring(0, colon).trim.toLowerCase) =
        h.substring(colon + 1).trim
      h = readLine(in)
    }
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException("WARC record without Content-Length"))
      .toLong
    require(len >= 0 && len <= Int.MaxValue, s"WARC Content-Length $len")
    val body = new Array[Byte](len.toInt)
    try in.readFully(body)
    catch { case _: EOFException =>
      throw new IllegalArgumentException("torn WARC record body") }
    Record(file,
      headers.getOrElse("warc-type", ""),
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("warc-date", ""),
      headers.getOrElse("content-type", ""), body)
  }

  /** CRLF/LF line off a byte stream (headers are ASCII); null at EOF
    * before any byte. */
  private def readLine(in: InputStream): String = {
    val bos = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') bos.write(c)
      c = in.read()
    }
    new String(bos.toByteArray, "UTF-8")
  }

  /** Split an HTTP message (a `response` record's body) into its
    * header block and payload bytes. */
  def httpPayload(body: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < body.length) {
      if (body(i) == '\r' && body(i + 1) == '\n' &&
        body(i + 2) == '\r' && body(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(body, i + 4, body.length)
      i += 1
    }
    // header-less bodies (wild crawls contain them) pass through whole
    body
  }

  // ---- writer (fixture/interchange face) ----

  /** Write records as one WARC file at `path`; `gzipPerRecord` uses
    * the member-per-record convention (each record its own gzip
    * member, concatenated). */
  def writeWarc(fs: org.apache.hadoop.fs.FileSystem, path: Path,
                records: Seq[Record], gzipPerRecord: Boolean): Unit = {
    val out = fs.create(path, true)
    try {
      records.foreach { r =>
        val bos = new java.io.ByteArrayOutputStream()
        val head = new StringBuilder()
          .append("WARC/1.0\r\n")
          .append(s"WARC-Type: ${r.recordType}\r\n")
        if (r.targetUri.nonEmpty)
          head.append(s"WARC-Target-URI: ${r.targetUri}\r\n"): Unit
        if (r.date.nonEmpty) head.append(s"WARC-Date: ${r.date}\r\n"): Unit
        if (r.contentType.nonEmpty)
          head.append(s"Content-Type: ${r.contentType}\r\n"): Unit
        head.append(s"Content-Length: ${r.content.length}\r\n\r\n"): Unit
        bos.write(head.toString.getBytes("UTF-8"))
        bos.write(r.content)
        bos.write("\r\n\r\n".getBytes("UTF-8"))
        if (gzipPerRecord) {
          val gz = new GZIPOutputStream(out) {
            // keep the underlying FS stream open across members
            override def close(): Unit = { finish(); `def`.end() }
          }
          gz.write(bos.toByteArray)
          gz.close()
        } else out.write(bos.toByteArray)
      }
    } finally out.close()
  }

  /** An HTTP response body around an HTML payload (the shape `fetch`
    * wrote it). */
  def httpResponse(html: Array[Byte], contentType: String = "text/html"): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n"
    head.getBytes("UTF-8") ++ html
  }
}
