package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream,
  ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException,
  InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SFTP-shaped file-drop ingestion: the enterprise "files land on an
  * SFTP server, pull the new ones each run" path.
  *
  * Reference: SftpSource (gobblin-core/.../extract/sftp/
  * SftpSource.java:29) is FileBasedSource wired to SftpFsHelper
  * (SftpFsHelper.java:63), a TimestampAwareFileBasedHelper whose ops are
  * connect / ls / getFileSize / getFileMTime / getFileStream / close;
  * FileBasedSource.java:58 plans work units from the diff between the
  * current listing and the previous run's snapshot. Here the same split:
  * [[SftpFsHelper]] is the per-connection protocol client,
  * [[SftpFileSource]] the snapshot-diff incremental planner (sharing
  * [[ManifestStore]] with the generic file-manifest source), and the
  * fetch of the planned delta is DISTRIBUTED — each task opens its own
  * connection, the reference's channel-per-command concurrency model
  * (SftpFsHelper.java getSftpChannel: "Create new channel every time a
  * command needs to be executed... to support execution of multiple
  * commands in parallel").
  *
  * Protocol: the wire format is the real SFTP version-3 packet dialect
  * (draft-ietf-secsh-filexfer-02: framed `uint32 len | byte type |
  * request-id | ...` messages — INIT/VERSION, OPENDIR/READDIR/NAME,
  * OPEN/READ/DATA, LSTAT/ATTRS, CLOSE, STATUS), implemented in
  * [[SftpWire]] and exercised end-to-end against the in-process
  * [[SftpServer]] (the q80/q101/q163 zero-egress endpoint pattern —
  * real sockets, no network). SFTP runs as a subsystem of SSH; the SSH
  * TRANSPORT layer (kex, cipher, MAC — RFC 4253) is not implementable
  * in this sandbox (no SSH/crypto jars) and is orthogonal to the data
  * plane, so the transport seam here is the RFC 4253 §4.2 cleartext
  * protocol-version exchange plus a single-line password userauth
  * standing in for SSH userauth; a production deployment wraps the same
  * [[SftpWire]] client in an encrypted SSH channel (jsch / sshd-core),
  * which this sandbox refuses loudly (the Kafka-jar pattern) rather
  * than faking.
  *
  * Scale shape: listing is driver-side metadata work, O(files) — the
  * reference's planning pass; the delta fetch is one task per file
  * batch with per-task connections streaming straight to the staging
  * filesystem (O(one chunk buffer) memory); the parse is a normal
  * distributed read over the staged files. At 100 TB of drops the
  * bottleneck is the remote server's egress, which `fetchParallelism`
  * caps deliberately — an SFTP endpoint is not a distributed filesystem
  * and a 1000-task hammer is a denial of service, the reference's
  * work-unit limiter lesson. */
object SftpWire {

  // packet types (draft-ietf-secsh-filexfer-02 §3)
  val FXP_INIT = 1; val FXP_VERSION = 2
  val FXP_OPEN = 3; val FXP_CLOSE = 4; val FXP_READ = 5
  val FXP_LSTAT = 7; val FXP_OPENDIR = 11; val FXP_READDIR = 12
  val FXP_STATUS = 101; val FXP_HANDLE = 102; val FXP_DATA = 103
  val FXP_NAME = 104; val FXP_ATTRS = 105

  // status codes (§7)
  val FX_OK = 0; val FX_EOF = 1; val FX_NO_SUCH_FILE = 2
  val FX_PERMISSION_DENIED = 3; val FX_FAILURE = 4

  // pflags for OPEN (§6.3) / attr flags (§5)
  val FXF_READ = 0x00000001
  val ATTR_SIZE = 0x00000001; val ATTR_PERMISSIONS = 0x00000004
  val ATTR_ACMODTIME = 0x00000008
  private val S_IFDIR = 0x4000

  val ProtocolVersion = 3

  final case class Attrs(size: Long, mtimeSec: Long, isDir: Boolean)

  /** CR-stripping line reader shared by every cleartext handshake in
    * this package (SFTP transport preamble both sides, the tunnel's
    * CONNECT response) — one implementation, one EOF convention. */
  private[sources] def readAsciiLine(in: InputStream,
                                     eofOk: Boolean = true): String = {
    val b = new ByteArrayOutputStream()
    var c = in.read()
    while (c != -1 && c != '\n') { if (c != '\r') b.write(c); c = in.read() }
    if (!eofOk && c == -1 && b.size() == 0)
      throw new EOFException("peer closed")
    new String(b.toByteArray, UTF_8)
  }

  final class PacketOut(val tpe: Int) {
    private val buf = new ByteArrayOutputStream()
    private val d = new DataOutputStream(buf)
    def u32(v: Long): this.type = { d.writeInt(v.toInt); this }
    def u64(v: Long): this.type = { d.writeLong(v); this }
    def str(s: String): this.type = bytes(s.getBytes(UTF_8))
    def bytes(b: Array[Byte]): this.type =
      { d.writeInt(b.length); d.write(b); this }
    def attrs(a: Attrs): this.type = {
      u32(ATTR_SIZE | ATTR_PERMISSIONS | ATTR_ACMODTIME)
      u64(a.size)
      u32(if (a.isDir) S_IFDIR | 0x1ed else 0x1a4) // 0755 dir / 0644 file
      u32(a.mtimeSec); u32(a.mtimeSec)             // atime, mtime
      this
    }
    def writeTo(out: DataOutputStream): Unit = {
      val payload = buf.toByteArray
      out.writeInt(1 + payload.length)
      out.writeByte(tpe)
      out.write(payload)
      out.flush()
    }
  }

  final class PacketIn(val tpe: Int, payload: Array[Byte]) {
    private val d = new DataInputStream(new ByteArrayInputStream(payload))
    def u32(): Long = d.readInt().toLong & 0xffffffffL
    def u64(): Long = d.readLong()
    def bytes(): Array[Byte] = {
      val n = d.readInt()
      require(n >= 0 && n <= payload.length, s"corrupt string length $n")
      val b = new Array[Byte](n); d.readFully(b); b
    }
    def str(): String = new String(bytes(), UTF_8)
    def attrs(): Attrs = {
      val flags = u32()
      val size = if ((flags & ATTR_SIZE) != 0) u64() else 0L
      var uid = 0L // ATTR_UIDGID (0x2) never sent by our peers, kept for shape
      if ((flags & 0x2) != 0) { uid = u32(); u32() }
      val perms = if ((flags & ATTR_PERMISSIONS) != 0) u32() else 0L
      var mtime = 0L
      if ((flags & ATTR_ACMODTIME) != 0) { u32(); mtime = u32() }
      Attrs(size, mtime, (perms & 0xf000) == S_IFDIR)
    }
  }

  /** Read one framed packet; EOFException on a closed peer. */
  def read(in: DataInputStream, maxPacket: Int = 1 << 20): PacketIn = {
    val len = in.readInt()
    require(len >= 1 && len <= maxPacket, s"bad packet length $len")
    val tpe = in.readUnsignedByte()
    val payload = new Array[Byte](len - 1)
    in.readFully(payload)
    new PacketIn(tpe, payload)
  }
}

/** Connection parameters. `password` stands in for SSH userauth on the
  * sandbox transport (see the class doc); production key-based auth
  * belongs to the SSH wrapper, not this layer. */
final case class SftpConfig(host: String, port: Int, user: String,
                            password: String,
                            connectTimeoutMs: Int = 3000,
                            readChunk: Int = 32768)

/** One SFTP connection: RFC 4253 §4.2 version exchange + userauth line
  * + SFTPv3 INIT/VERSION handshake, then synchronous request/response
  * commands. NOT thread-safe — one helper per task, the reference's
  * channel-per-command model. */
final class SftpFsHelper(cfg: SftpConfig) extends AutoCloseable {
  import SftpWire._

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  private var reqId = 0L

  def connect(): this.type = {
    socket = new Socket()
    socket.connect(new InetSocketAddress(cfg.host, cfg.port),
      cfg.connectTimeoutMs)
    socket.setSoTimeout(cfg.connectTimeoutMs * 10)
    val rawIn = new BufferedInputStream(socket.getInputStream)
    val rawOut = new BufferedOutputStream(socket.getOutputStream)
    // protocol-version exchange (RFC 4253 §4.2), then the cleartext
    // userauth line standing in for the SSH auth layer
    rawOut.write(s"SSH-2.0-graftSFTP_1.0\r\n".getBytes(UTF_8)); rawOut.flush()
    val banner = SftpWire.readAsciiLine(rawIn, eofOk = false)
    require(banner.startsWith("SSH-2.0-"),
      s"peer is not an SSH-2.0 endpoint: $banner")
    rawOut.write(s"userauth password ${cfg.user} ${cfg.password}\r\n"
      .getBytes(UTF_8)); rawOut.flush()
    val auth = SftpWire.readAsciiLine(rawIn, eofOk = false)
    require(auth == "auth-ok",
      s"SFTP authentication failed for user ${cfg.user}: $auth")
    in = new DataInputStream(rawIn)
    out = new DataOutputStream(rawOut)
    new PacketOut(FXP_INIT).u32(ProtocolVersion).writeTo(out)
    val v = SftpWire.read(in)
    require(v.tpe == FXP_VERSION && v.u32() == ProtocolVersion,
      "SFTP version negotiation failed")
    this
  }

  private def nextId(): Long = { reqId += 1; reqId }

  private def expect(id: Long, tpes: Int*): PacketIn = {
    val p = SftpWire.read(in)
    val got = p.u32()
    require(got == id, s"out-of-order response: want req $id got $got")
    require(tpes.contains(p.tpe),
      if (p.tpe == FXP_STATUS) {
        val code = p.u32(); val msg = p.str()
        s"SFTP error $code: $msg"
      } else s"unexpected packet type ${p.tpe}")
    p
  }

  private def status(id: Long): Long = {
    val p = SftpWire.read(in)
    require(p.u32() == id, "out-of-order response")
    require(p.tpe == FXP_STATUS, s"unexpected packet type ${p.tpe}")
    p.u32()
  }

  /** Directory entries (name, attrs), "."/".." excluded. */
  def ls(path: String): Seq[(String, Attrs)] = {
    var id = nextId()
    new PacketOut(FXP_OPENDIR).u32(id).str(path).writeTo(out)
    val handle = expect(id, FXP_HANDLE).bytes()
    val entries = Seq.newBuilder[(String, Attrs)]
    var eof = false
    while (!eof) {
      id = nextId()
      new PacketOut(FXP_READDIR).u32(id).bytes(handle).writeTo(out)
      val p = SftpWire.read(in)
      require(p.u32() == id, "out-of-order response")
      p.tpe match {
        case FXP_NAME =>
          val n = p.u32().toInt
          (0 until n).foreach { _ =>
            val name = p.str(); p.str() // longname (ls -l line), unused
            val a = p.attrs()
            if (name != "." && name != "..") entries += ((name, a))
          }
        case FXP_STATUS =>
          val code = p.u32()
          require(code == FX_EOF, s"READDIR failed with status $code")
          eof = true
        case other => sys.error(s"unexpected packet type $other")
      }
    }
    id = nextId()
    new PacketOut(FXP_CLOSE).u32(id).bytes(handle).writeTo(out)
    require(status(id) == FX_OK, "CLOSE failed")
    entries.result()
  }

  def stat(path: String): Attrs = {
    val id = nextId()
    new PacketOut(FXP_LSTAT).u32(id).str(path).writeTo(out)
    expect(id, FXP_ATTRS).attrs()
  }

  def getFileSize(path: String): Long = stat(path).size
  def getFileMTime(path: String): Long = stat(path).mtimeSec

  /** Stream a remote file into `os` via chunked READs; returns bytes
    * transferred. Memory is O(readChunk) — the reference's
    * getFileStream contract. */
  def fetch(path: String, os: OutputStream): Long = {
    var id = nextId()
    new PacketOut(FXP_OPEN).u32(id).str(path).u32(FXF_READ).u32(0)
      .writeTo(out)
    val handle = expect(id, FXP_HANDLE).bytes()
    var offset = 0L
    var eof = false
    while (!eof) {
      id = nextId()
      new PacketOut(FXP_READ).u32(id).bytes(handle).u64(offset)
        .u32(cfg.readChunk.toLong).writeTo(out)
      val p = SftpWire.read(in, maxPacket = cfg.readChunk + 64)
      require(p.u32() == id, "out-of-order response")
      p.tpe match {
        case FXP_DATA =>
          val data = p.bytes()
          os.write(data)
          offset += data.length
        case FXP_STATUS =>
          val code = p.u32()
          require(code == FX_EOF, s"READ failed with status $code")
          eof = true
        case other => sys.error(s"unexpected packet type $other")
      }
    }
    id = nextId()
    new PacketOut(FXP_CLOSE).u32(id).bytes(handle).writeTo(out)
    require(status(id) == FX_OK, "CLOSE failed")
    offset
  }

  override def close(): Unit = if (socket != null) socket.close()
}

/** The snapshot-diff incremental planner over an SFTP drop. */
object SftpFileSource {
  import ManifestSource.FileMeta

  final case class Plan(newFiles: Seq[FileMeta],
                        stagedPaths: Seq[String],
                        df: DataFrame,
                        commit: () => Unit)

  /** Recursive remote listing rooted at `remoteRoot`; driver-side
    * metadata work, like every FileBasedSource planning pass. */
  def listRemote(cfg: SftpConfig, remoteRoot: String): Seq[FileMeta] = {
    val h = new SftpFsHelper(cfg).connect()
    try {
      def walk(dir: String): Seq[FileMeta] =
        h.ls(dir).flatMap { case (name, a) =>
          val p = s"${dir.stripSuffix("/")}/$name"
          if (a.isDir) walk(p)
          else if (name.startsWith(".") || name.startsWith("_")) Nil
          else Seq(FileMeta(p, a.size, a.mtimeSec * 1000L))
        }
      walk(remoteRoot)
    } finally h.close()
  }

  // leading "/" must not become a leading "_" — Spark (and our own
  // listings) treat "_"/"."-prefixed files as hidden metadata. The
  // md5-suffix keeps distinct remote paths distinct after sanitizing
  // ("/a/x.csv" and "/a_x.csv" would otherwise collide on one staging
  // file and silently lose one file's rows while duplicating the
  // other's).
  private def stagedName(remote: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(remote.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    val base = remote.dropWhile(c => c == '/' || c == '.' || c == '_')
      .replaceAll("[^A-Za-z0-9._-]", "_")
    // tag BEFORE the extension: Spark keys compression codecs (.gz,
    // .bz2, ...) off the file suffix
    base.lastIndexOf('.') match {
      case -1 => s"$base-$tag"
      case i => s"${base.take(i)}-$tag${base.drop(i)}"
    }
  }

  /** Plan an incremental extract: list the drop, diff against the
    * committed manifest ([[ManifestStore]] — byte-identical semantics
    * to [[ManifestSource]]: new path, changed length, or changed mtime
    * re-extracts), fetch ONLY the delta to `stagingDir` with one
    * connection per task, and return a distributed read over the
    * staged files. `commit()` after publishing snapshots the full
    * listing, so the next run extracts nothing until the drop
    * changes. */
  def plan(spark: SparkSession, cfg: SftpConfig, stateDir: String,
           dataset: String, remoteRoot: String, stagingDir: String,
           format: String = "csv",
           options: Map[String, String] = Map.empty,
           fetchParallelism: Int = 4): Plan = {
    val store = new ManifestStore(spark, stateDir)
    val current = listRemote(cfg, remoteRoot)
    val committed = store.read(dataset)
    val fresh = current.filterNot(f =>
      ManifestSource.committedCovers(committed, f.path, f.length, f.modTime))
    val stagingPath = new Path(stagingDir)
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val staged = fresh.map(f => s"$stagingDir/${stagedName(f.path)}")
    if (fresh.nonEmpty) {
      val paths = fresh.map(_.path)
      // one connection per TASK, files streamed remote -> staging FS
      // with O(chunk) memory; parallelism capped because an SFTP
      // endpoint is a single server, not a DFS
      spark.sparkContext
        .parallelize(paths, math.min(fetchParallelism, paths.length))
        .foreachPartition { it: Iterator[String] =>
          val files = it.toSeq
          if (files.nonEmpty) {
            val h = new SftpFsHelper(cfg).connect()
            try {
              val fs = stagingPath.getFileSystem(hadoopConf.value)
              files.foreach { remote =>
                val dst = new Path(s"$stagingDir/${stagedName(remote)}")
                val os = fs.create(dst, true)
                try h.fetch(remote, os) finally os.close()
              }
            } finally h.close()
          }
        }
    }
    val reader = spark.read.format(format).options(options)
    val df =
      if (staged.nonEmpty) reader.load(staged: _*)
      else ManifestSource.emptyDelta(spark, reader, stagingDir)
    Plan(fresh, staged, df, () => store.commit(dataset, current))
  }
}

/** In-process SFTP endpoint serving a local directory tree — the
  * zero-egress test/oracle stand-in (real sockets, the q101 pattern).
  * Speaks the same [[SftpWire]] dialect as the client: version
  * exchange, password userauth, then SFTPv3 packets. Path resolution is
  * confined to `root`; traversal outside it answers
  * FX_PERMISSION_DENIED. */
object SftpServer {

  final class Running(srv: ServerSocket, thread: Thread) extends AutoCloseable {
    def port: Int = srv.getLocalPort
    override def close(): Unit = { srv.close(); thread.interrupt() }
  }

  def serve(root: java.nio.file.Path, user: String, password: String)
      : Running = {
    val srv = new ServerSocket(0, 50,
      java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      try while (true) {
        val s = srv.accept()
        val t = new Thread(() => handle(s, root, user, password))
        t.setDaemon(true); t.start()
      } catch { case _: Throwable => () } // closed
    }, "sftp-sim-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    new Running(srv, acceptor)
  }

  private def handle(sock: Socket, root: java.nio.file.Path,
                     user: String, password: String): Unit = {
    import SftpWire._
    try {
      val rawIn = new BufferedInputStream(sock.getInputStream)
      val rawOut = new BufferedOutputStream(sock.getOutputStream)
      def line(): String = SftpWire.readAsciiLine(rawIn)
      rawOut.write("SSH-2.0-graftSftpd_1.0\r\n".getBytes(UTF_8)); rawOut.flush()
      val client = line()
      if (!client.startsWith("SSH-2.0-")) { sock.close(); return }
      val auth = line().split(" ", 4)
      val ok = auth.length == 4 && auth(0) == "userauth" &&
        auth(1) == "password" && auth(2) == user && auth(3) == password
      rawOut.write((if (ok) "auth-ok\r\n" else "auth-fail\r\n").getBytes(UTF_8))
      rawOut.flush()
      if (!ok) { sock.close(); return }
      val in = new DataInputStream(rawIn)
      val out = new DataOutputStream(rawOut)

      // handle table: opaque 8-byte ids -> open dir iterators / channels
      var nextHandle = 0L
      // per-handle remaining entries held as a concrete buffer — using
      // an Iterator again after take() on it is undefined by the Scala
      // collection contract, so READDIR slices the buffer explicitly
      val dirs = scala.collection.mutable.Map[String, scala.collection.mutable.Buffer[java.io.File]]()
      val files = scala.collection.mutable.Map[String, java.io.RandomAccessFile]()
      def newHandle(): String = { nextHandle += 1; f"h$nextHandle%07d" }

      def resolve(remote: String): Option[java.io.File] = {
        val rel = remote.dropWhile(_ == '/')
        val p = root.resolve(rel).normalize()
        if (p.startsWith(root)) Some(p.toFile) else None
      }
      def sendStatus(id: Long, code: Int, msg: String): Unit =
        new PacketOut(FXP_STATUS).u32(id).u32(code.toLong).str(msg)
          .str("en").writeTo(out)
      def attrsOf(f: java.io.File) =
        Attrs(f.length(), f.lastModified() / 1000L, f.isDirectory)

      while (true) {
        val p = SftpWire.read(in)
        p.tpe match {
          case FXP_INIT =>
            new PacketOut(FXP_VERSION).u32(ProtocolVersion.toLong).writeTo(out)
          case FXP_OPENDIR =>
            val id = p.u32(); val path = p.str()
            resolve(path) match {
              case Some(d) if d.isDirectory =>
                val h = newHandle()
                dirs(h) = d.listFiles().sortBy(_.getName).toBuffer
                new PacketOut(FXP_HANDLE).u32(id).str(h).writeTo(out)
              case Some(_) => sendStatus(id, FX_NO_SUCH_FILE, s"not a directory: $path")
              case None => sendStatus(id, FX_PERMISSION_DENIED, s"outside root: $path")
            }
          case FXP_READDIR =>
            val id = p.u32(); val h = p.str()
            dirs.get(h) match {
              case Some(buf) if buf.nonEmpty =>
                val batch = buf.take(64).toSeq
                buf.remove(0, batch.length)
                val pk = new PacketOut(FXP_NAME).u32(id).u32(batch.length.toLong)
                batch.foreach { f =>
                  pk.str(f.getName).str(f.getName).attrs(attrsOf(f))
                }
                pk.writeTo(out)
              case Some(_) => sendStatus(id, FX_EOF, "end of directory")
              case None => sendStatus(id, FX_FAILURE, s"bad handle $h")
            }
          case FXP_LSTAT =>
            val id = p.u32(); val path = p.str()
            resolve(path) match {
              case Some(f) if f.exists() =>
                new PacketOut(FXP_ATTRS).u32(id).attrs(attrsOf(f)).writeTo(out)
              case Some(_) => sendStatus(id, FX_NO_SUCH_FILE, s"no such file: $path")
              case None => sendStatus(id, FX_PERMISSION_DENIED, s"outside root: $path")
            }
          case FXP_OPEN =>
            val id = p.u32(); val path = p.str(); val pflags = p.u32()
            resolve(path) match {
              case Some(f) if f.isFile && (pflags & FXF_READ) != 0 =>
                val h = newHandle()
                files(h) = new java.io.RandomAccessFile(f, "r")
                new PacketOut(FXP_HANDLE).u32(id).str(h).writeTo(out)
              case Some(_) => sendStatus(id, FX_NO_SUCH_FILE, s"no such file: $path")
              case None => sendStatus(id, FX_PERMISSION_DENIED, s"outside root: $path")
            }
          case FXP_READ =>
            val id = p.u32(); val h = p.str()
            val offset = p.u64(); val len = p.u32().toInt
            files.get(h) match {
              case Some(raf) =>
                if (offset >= raf.length()) sendStatus(id, FX_EOF, "eof")
                else {
                  val n = math.min(len.toLong, raf.length() - offset).toInt
                  val buf = new Array[Byte](n)
                  raf.seek(offset); raf.readFully(buf)
                  new PacketOut(FXP_DATA).u32(id).bytes(buf).writeTo(out)
                }
              case None => sendStatus(id, FX_FAILURE, s"bad handle $h")
            }
          case FXP_CLOSE =>
            val id = p.u32(); val h = p.str()
            dirs.remove(h)
            files.remove(h).foreach(_.close())
            sendStatus(id, FX_OK, "ok")
          case other =>
            // a type we don't serve: report failure on its request id
            sendStatus(p.u32(), FX_FAILURE, s"unsupported packet type $other")
        }
      }
    } catch { case _: Throwable => () } // peer closed / server stopping
    finally sock.close()
  }
}
