package graft.operators

import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.functions.KeyCrypto

/** In-flight distcp stream transforms (DistcpConverter /
  * UnGzipConverter / DecryptConverter / TarArchiveInputStreamDataWriter
  * semantics): decrypt+gunzip+untar while the bytes move, extension
  * rewriting at the destination, zip-slip refusal, presence-based
  * idempotency, GCM authentication. */
class CopyStreamSpec extends SparkSpec {

  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ring = KeyCrypto.KeyRing(Map(
    1 -> Array.tabulate(16)(i => (i + 3).toByte),
    2 -> Array.tabulate(16)(i => (i * 7 + 1).toByte)))

  private def writeBytes(path: Path, data: Array[Byte]): Unit = {
    val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(path, true)
    try out.write(data) finally out.close()
  }

  private def readBytes(path: Path): Array[Byte] = {
    val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(path)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  private def task(src: String, dst: String, len: Long = 0L) = {
    import spark.implicits._
    spark.createDataset(Seq(CopyExec.CopyTask(src, dst, len)))
  }

  test("ungzip in flight: .gz lands decompressed, extension stripped") {
    val base = tmpDir("cs-gz")
    val payload = ("line one\nline two\n" * 100).getBytes("UTF-8")
    writeBytes(new Path(s"$base/src/doc.txt.gz"), gzip(payload))
    val stats = CopyStream.execute(
      task(s"$base/src/doc.txt.gz", s"$base/dst/doc.txt.gz"),
      Seq(CopyStream.Ungzip))
    assert(stats.filesCopied == 1 && stats.entriesWritten == 1)
    assert(!fs(base).exists(new Path(s"$base/dst/doc.txt.gz")))
    assert(readBytes(new Path(s"$base/dst/doc.txt")).sameElements(payload))
  }

  test("tgz untar: root entry re-rooted to the destination dir, nesting kept") {
    val base = tmpDir("cs-tgz")
    val members = Seq(
      "a.txt" -> "alpha".getBytes("UTF-8"),
      "sub/b.txt" -> "beta".getBytes("UTF-8"),
      "sub/deep/c.txt" -> "gamma".getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    CopyStream.tarMembers("dropRoot", members, gz); gz.close()
    writeBytes(new Path(s"$base/src/drop.tgz"), bos.toByteArray)
    val stats = CopyStream.execute(
      task(s"$base/src/drop.tgz", s"$base/dst/drop.tgz"),
      Seq(CopyStream.Ungzip), untar = true)
    assert(stats.filesCopied == 1 && stats.entriesWritten == 3)
    // .tgz stripped -> destination DIRECTORY named "drop"
    members.foreach { case (name, data) =>
      assert(readBytes(new Path(s"$base/dst/drop/$name")).sameElements(data),
        name)
    }
  }

  test("full chain .tar.gz.aes: decrypt -> gunzip -> untar in one pass") {
    val base = tmpDir("cs-chain")
    val members = Seq("x.csv" -> "1,a\n2,b\n".getBytes("UTF-8"),
      "y.csv" -> "3,c\n".getBytes("UTF-8"))
    CopyStream.writeTarGzAes(fs(base), new Path(s"$base/src/batch.tar.gz.aes"),
      "batch", members, ring)
    val stats = CopyStream.execute(
      task(s"$base/src/batch.tar.gz.aes", s"$base/dst/batch.tar.gz.aes"),
      Seq(CopyStream.DecryptAes(ring), CopyStream.Ungzip), untar = true)
    assert(stats.filesCopied == 1 && stats.entriesWritten == 2)
    members.foreach { case (name, data) =>
      assert(readBytes(new Path(s"$base/dst/batch/$name")).sameElements(data))
    }
  }

  test("decrypt resolves the WRITING key id, not the newest") {
    val base = tmpDir("cs-rot")
    // encrypt with a ring whose newest is key 1; decrypt with the full ring
    val oldRing = KeyCrypto.KeyRing(Map(1 -> ring.keys(1)))
    val payload = "rotated".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    CopyStream.encryptAes(oldRing, new java.io.ByteArrayInputStream(payload), bos)
    writeBytes(new Path(s"$base/src/f.aes"), bos.toByteArray)
    CopyStream.execute(task(s"$base/src/f.aes", s"$base/dst/f.aes"),
      Seq(CopyStream.DecryptAes(ring)))
    assert(readBytes(new Path(s"$base/dst/f")).sameElements(payload))
  }

  test("unknown key id refuses loudly") {
    val base = tmpDir("cs-nokey")
    val payload = "secret".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    CopyStream.encryptAes(ring, new java.io.ByteArrayInputStream(payload), bos)
    writeBytes(new Path(s"$base/src/f.aes"), bos.toByteArray)
    val retired = KeyCrypto.KeyRing(Map(1 -> ring.keys(1))) // no key 2
    val ex = intercept[org.apache.spark.SparkException] {
      CopyStream.execute(task(s"$base/src/f.aes", s"$base/dst/f.aes"),
        Seq(CopyStream.DecryptAes(retired)))
    }
    assert(ex.getMessage.contains("credential store") ||
      Option(ex.getCause).exists(_.getMessage.contains("credential store")))
  }

  test("non-AES header (e.g. OpenPGP) refuses loudly instead of landing bytes") {
    val base = tmpDir("cs-gpg")
    // a plausible OpenPGP packet start — anything without our header shape
    writeBytes(new Path(s"$base/src/f.gpg.aes"),
      Array[Byte](-123, 1, 12, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
    intercept[org.apache.spark.SparkException] {
      CopyStream.execute(task(s"$base/src/f.gpg.aes", s"$base/dst/f.gpg.aes"),
        Seq(CopyStream.DecryptAes(ring)))
    }
    assert(!fs(base).exists(new Path(s"$base/dst/f.gpg")))
  }

  test("tampered ciphertext fails the GCM tag — nothing published") {
    val base = tmpDir("cs-tamper")
    val payload = ("x" * 4096).getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    CopyStream.encryptAes(ring, new java.io.ByteArrayInputStream(payload), bos)
    val enc = bos.toByteArray
    enc(enc.length - 1) = (enc(enc.length - 1) ^ 0x40).toByte
    writeBytes(new Path(s"$base/src/f.aes"), enc)
    intercept[org.apache.spark.SparkException] {
      CopyStream.execute(task(s"$base/src/f.aes", s"$base/dst/f.aes"),
        Seq(CopyStream.DecryptAes(ring)))
    }
    // staging only — the final name never appeared
    assert(!fs(base).exists(new Path(s"$base/dst/f")))
  }

  test("zip-slip entry refuses the archive") {
    val base = tmpDir("cs-slip")
    val bos = new java.io.ByteArrayOutputStream()
    val tar = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(bos)
    val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry("../evil.txt")
    val data = "pwned".getBytes("UTF-8")
    e.setSize(data.length.toLong)
    tar.putArchiveEntry(e); tar.write(data); tar.closeArchiveEntry(); tar.finish()
    writeBytes(new Path(s"$base/src/drop.tar"), bos.toByteArray)
    val ex = intercept[org.apache.spark.SparkException] {
      CopyStream.execute(task(s"$base/src/drop.tar", s"$base/dst/drop.tar"),
        Seq.empty, untar = true)
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("path traversal"))
    assert(!fs(base).exists(new Path(s"$base/dst/evil.txt")))
    assert(!fs(base).exists(new Path(s"$base/evil.txt")))
  }

  test("re-run skips a published destination (presence-based idempotency)") {
    val base = tmpDir("cs-rerun")
    val payload = "stable".getBytes("UTF-8")
    writeBytes(new Path(s"$base/src/doc.txt.gz"), gzip(payload))
    val t1 = CopyStream.execute(
      task(s"$base/src/doc.txt.gz", s"$base/dst/doc.txt.gz"),
      Seq(CopyStream.Ungzip))
    val t2 = CopyStream.execute(
      task(s"$base/src/doc.txt.gz", s"$base/dst/doc.txt.gz"),
      Seq(CopyStream.Ungzip))
    assert(t1.filesCopied == 1 && t2.filesCopied == 0 && t2.filesSkipped == 1)
    assert(readBytes(new Path(s"$base/dst/doc.txt")).sameElements(payload))
  }

  test("destName strips chained extensions in converter order") {
    assert(CopyStream.destName("f.tar.gz.aes",
      Seq(CopyStream.DecryptAes(ring), CopyStream.Ungzip), untar = true) == "f")
    assert(CopyStream.destName("f.tgz", Seq(CopyStream.Ungzip),
      untar = true) == "f")
    assert(CopyStream.destName("f.txt.gz", Seq(CopyStream.Ungzip),
      untar = false) == "f.txt")
    assert(CopyStream.destName("plain.txt", Seq.empty, untar = false) == "plain.txt")
  }
}
