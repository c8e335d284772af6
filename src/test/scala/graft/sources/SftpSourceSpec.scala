package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class SftpSourceSpec extends SparkSpec {

  private def writeDrop(root: String, files: Map[String, String]): Unit =
    files.foreach { case (rel, content) =>
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(UTF_8))
    }

  private def withServer[A](root: String)(body: SftpConfig => A): A = {
    val srv = SftpServer.serve(Paths.get(root), "loader", "s3cret")
    try body(SftpConfig("127.0.0.1", srv.port, "loader", "s3cret"))
    finally srv.close()
  }

  test("helper: ls/stat/fetch over the SFTPv3 packet dialect") {
    val root = tmpDir("sftp-helper")
    writeDrop(root, Map(
      "drop/a.csv" -> "k,v\n1,x\n",
      "drop/b.csv" -> "k,v\n2,y\n",
      "drop/inner/c.csv" -> "k,v\n3,z\n"))
    withServer(root) { cfg =>
      val h = new SftpFsHelper(cfg).connect()
      try {
        val names = h.ls("/drop").map(_._1).sorted
        assert(names == Seq("a.csv", "b.csv", "inner"))
        val (_, innerAttrs) = h.ls("/drop").find(_._1 == "inner").get
        assert(innerAttrs.isDir)
        assert(h.getFileSize("/drop/a.csv") == "k,v\n1,x\n".length.toLong)
        assert(h.getFileMTime("/drop/a.csv") > 0)
        val os = new ByteArrayOutputStream()
        assert(h.fetch("/drop/b.csv", os) == "k,v\n2,y\n".length.toLong)
        assert(new String(os.toByteArray, UTF_8) == "k,v\n2,y\n")
      } finally h.close()
    }
  }

  test("helper: a file larger than readChunk streams via multiple READs") {
    val root = tmpDir("sftp-chunks")
    val big = (1 to 5000).map(i => s"line-$i").mkString("\n")
    writeDrop(root, Map("big.txt" -> big))
    withServer(root) { base =>
      val cfg = base.copy(readChunk = 1024) // forces ~40 READ round-trips
      val h = new SftpFsHelper(cfg).connect()
      try {
        val os = new ByteArrayOutputStream()
        assert(h.fetch("/big.txt", os) == big.getBytes(UTF_8).length.toLong)
        assert(new String(os.toByteArray, UTF_8) == big)
      } finally h.close()
    }
  }

  test("wrong password is refused before any SFTP packet flows") {
    val root = tmpDir("sftp-auth")
    writeDrop(root, Map("x.csv" -> "k\n1\n"))
    withServer(root) { cfg =>
      val e = intercept[IllegalArgumentException] {
        new SftpFsHelper(cfg.copy(password = "wrong")).connect()
      }
      assert(e.getMessage.contains("authentication failed"), e.getMessage)
    }
  }

  test("path traversal outside the served root is refused") {
    val root = tmpDir("sftp-jail") + "/served"
    writeDrop(root, Map("ok.csv" -> "k\n1\n"))
    Files.write(Paths.get(root).getParent.resolve("secret.txt"),
      "no".getBytes(UTF_8))
    withServer(root) { cfg =>
      val h = new SftpFsHelper(cfg).connect()
      try {
        val e = intercept[Exception] {
          h.fetch("/../secret.txt", new ByteArrayOutputStream())
        }
        assert(e.getMessage.contains("SFTP error 3"), e.getMessage)
      } finally h.close()
    }
  }

  test("remote paths that sanitize identically stage to DISTINCT files") {
    // review finding: /drop/a/x.csv and /drop/a_x.csv both sanitized to
    // drop_a_x.csv, one overwriting the other — rows silently lost AND
    // duplicated. The staged names carry a path hash now.
    val root = tmpDir("sftp-collide")
    writeDrop(root, Map(
      "drop/a/x.csv" -> "k,v\n1,nested\n",
      "drop/a_x.csv" -> "k,v\n2,flat\n"))
    withServer(root) { cfg =>
      val p = SftpFileSource.plan(spark, cfg, tmpDir("sftp-collide-state"),
        "d", "/drop", tmpDir("sftp-collide-staging"), format = "csv",
        options = Map("header" -> "true"))
      assert(p.stagedPaths.distinct.length == 2,
        s"staged paths must be distinct: ${p.stagedPaths}")
      val rows = p.df.collect().map(_.getString(1)).sorted.toSeq
      assert(rows == Seq("flat", "nested"), rows.toString)
    }
  }

  test("an empty drop plans an empty delta instead of crashing on schema") {
    val root = tmpDir("sftp-empty")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "drop"))
    withServer(root) { cfg =>
      val p = SftpFileSource.plan(spark, cfg, tmpDir("sftp-empty-state"),
        "d", "/drop", tmpDir("sftp-empty-staging"), format = "csv")
      assert(p.newFiles.isEmpty && p.df.count() == 0)
    }
  }

  test("incremental plan: first run fetches the drop, second run is empty, " +
      "a changed file re-extracts") {
    val root = tmpDir("sftp-inc")
    writeDrop(root, Map(
      "drop/p1.csv" -> "k,v\n1,a\n2,b\n",
      "drop/p2.csv" -> "k,v\n3,c\n"))
    val state = tmpDir("sftp-inc-state")
    val staging = tmpDir("sftp-inc-staging")
    withServer(root) { cfg =>
      def planOnce() = SftpFileSource.plan(spark, cfg, state, "drop",
        "/drop", staging, format = "csv",
        options = Map("header" -> "true", "inferSchema" -> "true"))
      val p1 = planOnce()
      assert(p1.newFiles.map(_.path).sorted ==
        Seq("/drop/p1.csv", "/drop/p2.csv"))
      assert(p1.df.count() == 3)
      p1.commit()
      // second run: nothing new, schema preserved
      val p2 = planOnce()
      assert(p2.newFiles.isEmpty && p2.df.count() == 0)
      assert(p2.df.columns.toSeq == Seq("k", "v"))
      // a rewritten file (same name, new content/length) re-extracts alone
      Thread.sleep(5)
      writeDrop(root, Map("drop/p2.csv" -> "k,v\n3,c\n4,d\n"))
      val p3 = planOnce()
      assert(p3.newFiles.map(_.path) == Seq("/drop/p2.csv"))
      assert(p3.df.count() == 2)
      p3.commit()
      assert(planOnce().newFiles.isEmpty)
    }
  }
}
