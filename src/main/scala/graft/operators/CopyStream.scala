package graft.operators

import java.io.{DataInputStream, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import javax.crypto.{Cipher, CipherInputStream, CipherOutputStream}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Dataset
import org.apache.spark.util.LongAccumulator

import graft.functions.KeyCrypto

/** In-flight stream transforms for the distcp copy flow: decrypt,
  * decompress and unpack WHILE the bytes move, so an archived drop
  * (`data.tar.gz.aes`) lands at the destination as the plain unpacked
  * tree in one pass — no intermediate landing copies.
  *
  * Reference semantics:
  *  - `DistcpConverter` (gobblin-data-management/.../copy/converter/
  *    DistcpConverter.java:43) — each converter wraps the file's
  *    InputStream and strips its extensions from the destination name;
  *    converters chain in job order.
  *  - `UnGzipConverter` (UnGzipConverter.java:40) — GZIPInputStream
  *    wrap; strips `.tar/.gzip/.gz/.tgz` (the `.tar` strip pairs with
  *    the untar writer below).
  *  - `DecryptConverter` (DecryptConverter.java:52) — algorithm-pluggable
  *    StreamCodec decrypt; strips the codec's tag extension. Here the
  *    codec is the keystore-backed rotating AES-GCM seam the row-level
  *    crypto already uses ([[graft.functions.KeyCrypto]]) with the same
  *    self-describing `[keyId][ivLen][iv]` header, so file drops and
  *    row columns share one key-rotation story. OpenPGP (`.gpg`)
  *    payloads refuse loudly — no OpenPGP implementation ships in the
  *    sandbox and silently passing ciphertext through would corrupt
  *    the destination.
  *  - `TarArchiveInputStreamDataWriter` (copy/writer/
  *    TarArchiveInputStreamDataWriter.java:49) — the writer unpacks a
  *    tar stream at the destination: the root entry's name is replaced
  *    by the destination directory name, directory entries mkdir, file
  *    entries stream-copy, and any entry escaping the destination
  *    (zip-slip) aborts the task.
  *
  * Spark-first: transforms execute inside the same `foreachPartition`
  * tasks as the byte copy ([[CopyExec]]) — a million archived files
  * decrypt/unpack with executor parallelism and zero driver traffic.
  * Staging + rename keeps re-runs idempotent even though transformed
  * output lengths are unknowable up front: a completed destination
  * (file or unpacked tree) is skipped by presence, and interrupted
  * tasks leave only hidden `.copy-tmp-*` staging that the re-run
  * overwrites.
  */
object CopyStream {

  /** One in-flight stream transform (the DistcpConverter contract:
    * wrap the stream, name the extensions the destination loses). */
  sealed trait Transform extends Serializable {
    def extensionsToRemove: Seq[String]
    def wrap(in: InputStream): InputStream
  }

  /** GZIP decompression (UnGzipConverter.java:48-57). `.tar` is NOT
    * stripped here — [[execute]] strips it when untar is on, matching
    * the reference's converter+writer pairing. */
  case object Ungzip extends Transform {
    val extensionsToRemove: Seq[String] = Seq(".gzip", ".gz", ".tgz")
    def wrap(in: InputStream): InputStream = new GZIPInputStream(in)
  }

  /** Keystore-backed AES-GCM stream decrypt: `[keyId][ivLen][iv]`
    * header names the writing key (rotation-safe), GCM authenticates —
    * the tag check fails the copy task instead of landing corrupt
    * bytes. A `.gpg` (OpenPGP) magic byte refuses loudly. */
  final case class DecryptAes(ring: KeyCrypto.KeyRing) extends Transform {
    val extensionsToRemove: Seq[String] = Seq(".aes")
    def wrap(in: InputStream): InputStream = {
      val din = new DataInputStream(in)
      val keyId = din.readInt()
      val ivLen = din.readInt()
      require(ivLen == KeyCrypto.GcmIvBytes,
        s"encrypted file header ivLen=$ivLen — not a rotating-AES-GCM " +
          "stream (OpenPGP .gpg payloads are not decryptable here: no " +
          "OpenPGP implementation ships in this environment)")
      val iv = new Array[Byte](ivLen)
      din.readFully(iv)
      val key = ring.keys.getOrElse(keyId, throw new IllegalStateException(
        s"file encrypted with key $keyId, which is not in the credential store"))
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new GCMParameterSpec(KeyCrypto.GcmTagBits, iv))
      new CipherInputStream(din, cipher)
    }
  }

  /** Strip `exts` from the END of `name` repeatedly, in listed order
    * (PathUtils.removeExtension semantics: "file.tar.gz" with
    * [".tar",".gz"] → "file"). */
  def stripExtensions(name: String, exts: Seq[String]): String = {
    var cur = name
    var changed = true
    while (changed) {
      changed = false
      exts.foreach { e =>
        if (cur.endsWith(e)) { cur = cur.dropRight(e.length); changed = true }
      }
    }
    cur
  }

  /** Destination name after a transform chain (+ optional untar). */
  def destName(name: String, transforms: Seq[Transform],
               untar: Boolean): String = {
    val exts = transforms.flatMap(_.extensionsToRemove) ++
      (if (untar) Seq(".tar") else Nil)
    stripExtensions(name, exts)
  }

  final case class TransformStats(filesCopied: Long, filesSkipped: Long,
                                  entriesWritten: Long, bytesWritten: Long)

  /** Execute a copy plan with in-flight transforms. Each task's source
    * stream is wrapped by `transforms` in order (outermost first, the
    * reference's converter chain: for `x.tar.gz.aes` pass
    * `Seq(DecryptAes(ring), Ungzip)` and `untar = true`); the
    * destination path is the task's `dst` minus the stripped
    * extensions. With `untar` the destination is a DIRECTORY the
    * archive unpacks into; otherwise a single file. */
  def execute(tasks: Dataset[CopyExec.CopyTask], transforms: Seq[Transform],
              untar: Boolean = false, parallelism: Int = 0): TransformStats = {
    val spark = tasks.sparkSession
    val sc = spark.sparkContext
    val copied: LongAccumulator = sc.longAccumulator("graft.copy.t.files")
    val skipped: LongAccumulator = sc.longAccumulator("graft.copy.t.skipped")
    val entries: LongAccumulator = sc.longAccumulator("graft.copy.t.entries")
    val bytes: LongAccumulator = sc.longAccumulator("graft.copy.t.bytes")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val work = if (parallelism > 0) tasks.repartition(parallelism) else tasks
    work.foreachPartition { (it: Iterator[CopyExec.CopyTask]) =>
      val conf = hconf.value
      it.foreach { t =>
        val src = new Path(t.src)
        val sfs = src.getFileSystem(conf)
        val rawDst = new Path(t.dst)
        val dst = new Path(rawDst.getParent,
          destName(rawDst.getName, transforms, untar))
        val dfs = dst.getFileSystem(conf)
        if (dfs.exists(dst)) {
          // transformed output length is unknowable up front, so
          // idempotency is presence-based: rename published it whole
          skipped.add(1)
        } else {
          if (!dfs.exists(dst.getParent)) dfs.mkdirs(dst.getParent)
          val tmp = new Path(dst.getParent, s".copy-tmp-${dst.getName}")
          if (dfs.exists(tmp)) dfs.delete(tmp, true)
          val raw = sfs.open(src)
          val in = transforms.foldLeft(raw: InputStream)((s, tr) => tr.wrap(s))
          try {
            if (untar) {
              val (n, b) = untarTo(in, dfs, tmp)
              entries.add(n); bytes.add(b)
            } else {
              val out = dfs.create(tmp, true)
              try bytes.add(pipe(in, out)) finally out.close()
              entries.add(1)
            }
          } finally in.close()
          require(dfs.rename(tmp, dst), s"copy rename failed: $tmp -> $dst")
          copied.add(1)
        }
      }
    }
    TransformStats(copied.value, skipped.value, entries.value, bytes.value)
  }

  /** Unpack a tar stream under `root` (TarArchiveInputStreamDataWriter
    * .writeImpl): the archive's root entry maps to `root` itself,
    * nested paths keep their layout, and an entry resolving outside
    * `root` (zip-slip, `..` or absolute) aborts. Returns
    * (fileEntries, bytes). */
  private def untarTo(in: InputStream, dfs: FileSystem,
                      root: Path): (Long, Long) = {
    val tar = new TarArchiveInputStream(in)
    dfs.mkdirs(root)
    val rootQual = root.toString + "/"
    var nFiles = 0L
    var nBytes = 0L
    var entry = tar.getNextEntry
    // the first entry of a dir archive is the root dir itself; its name
    // prefix is replaced by the destination name (reference :72-82)
    val rootPrefix: String = entry match {
      case e: TarArchiveEntry if e.isDirectory => val n = e.getName; entry = tar.getNextEntry; n
      case _ => ""
    }
    while (entry != null) {
      val name0 = entry.getName
      val rel = if (rootPrefix.nonEmpty && name0.startsWith(rootPrefix))
        name0.substring(rootPrefix.length) else name0
      val target = new Path(root, rel)
      val targetQual = target.toString
      require(targetQual == root.toString || targetQual.startsWith(rootQual),
        s"tar entry '$name0' resolves outside the destination '$root' — " +
          "refusing the archive (path traversal)")
      if (entry.isDirectory) {
        dfs.mkdirs(target)
      } else {
        if (!dfs.exists(target.getParent)) dfs.mkdirs(target.getParent)
        val out = dfs.create(target, true)
        try nBytes += pipe(tar, out) finally out.close()
        nFiles += 1
      }
      entry = tar.getNextEntry
    }
    (nFiles, nBytes)
  }

  private def pipe(in: InputStream, out: OutputStream): Long = {
    val buf = new Array[Byte](1 << 20)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); total += n; n = in.read(buf) }
    total
  }

  // ---- fixture / sink faces (the encode direction, for drops we write) ----

  /** Stream-encrypt `in` to `out` with the newest ring key and the
    * self-describing `[keyId][ivLen][iv]` header (the file-level twin of
    * RotatingAESCodec's encodeOutputStream). */
  def encryptAes(ring: KeyCrypto.KeyRing, in: InputStream,
                 out: OutputStream): Unit = {
    val keyId = ring.newestId
    val iv = new Array[Byte](KeyCrypto.GcmIvBytes)
    new java.security.SecureRandom().nextBytes(iv)
    val hdr = java.nio.ByteBuffer.allocate(8 + iv.length)
    hdr.putInt(keyId).putInt(iv.length).put(iv)
    out.write(hdr.array())
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(ring.keys(keyId), "AES"),
      new GCMParameterSpec(KeyCrypto.GcmTagBits, iv))
    val cout = new CipherOutputStream(out, cipher)
    pipe(in, cout)
    cout.close()
  }

  /** Write `(relativeName, bytes)` members as `<rootDir>/name` entries of
    * a tar stream (plus the root dir entry the unpack side re-roots). */
  def tarMembers(rootDir: String, members: Seq[(String, Array[Byte])],
                 out: OutputStream): Unit = {
    val tar = new TarArchiveOutputStream(out)
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    val rootEntry = new TarArchiveEntry(s"$rootDir/")
    tar.putArchiveEntry(rootEntry)
    tar.closeArchiveEntry()
    members.foreach { case (name, data) =>
      val e = new TarArchiveEntry(s"$rootDir/$name")
      e.setSize(data.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(data)
      tar.closeArchiveEntry()
    }
    tar.finish()
  }

  /** Build an encrypted compressed archive (`.tar.gz.aes`) of `members`
    * at `path` — the fixture/sink face of the full decrypt→gunzip→untar
    * chain. */
  def writeTarGzAes(fs: FileSystem, path: Path, rootDir: String,
                    members: Seq[(String, Array[Byte])],
                    ring: KeyCrypto.KeyRing): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    tarMembers(rootDir, members, gz)
    gz.close()
    val out = fs.create(path, true)
    try encryptAes(ring, new java.io.ByteArrayInputStream(bos.toByteArray), out)
    finally out.close()
  }
}
