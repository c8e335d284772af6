package graft.functions

import java.security.{KeyStore, SecureRandom}
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Keystore-backed key management + key-rotating AES encryption — the
  * reference's credential-store surface:
  *
  *  - [[JceksCredentialStore]]: JCEKSKeystoreCredentialStore
  *    (gobblin-modules/gobblin-crypto/.../JCEKSKeystoreCredentialStore
  *    .java:47) — password-protected JCEKS keystore of numbered AES
  *    keys, loaded through Hadoop's FileSystem so the same path works on
  *    HDFS/object stores.
  *  - [[JsonCredentialStore]]: JsonCredentialStore.java:43 — a JSON map
  *    of keyId → encoded key, hex or base64 per KeyToStringCodec
  *    (HexKeyToStringCodec.java:25, Base64KeyToStringCodec.java:25).
  *  - [[KeyCrypto.aesEncryptRotating]]/[[KeyCrypto.aesDecryptRotating]]:
  *    RotatingAESCodec.java:58 — every ciphertext is self-describing
  *    ([keyId][iv] header), encryption uses the NEWEST key, decryption
  *    resolves whichever key wrote the row, so keys rotate without
  *    rewriting old data.
  *
  * Spark-first: the store is read ONCE on the driver and the (small) key
  * map travels inside the expression to executors — no per-row or
  * per-partition keystore I/O, no driver round-trips. Encryption is
  * AES-GCM (authenticated: a tampered ciphertext FAILS decryption
  * instead of silently decrypting to garbage or flipping plaintext
  * bits, which the reference's CBC construction permits) with a fresh
  * random 12-byte IV per row and the same self-describing
  * [keyId][ivLen][iv] header; decryption dispatches on ivLen, so
  * 16-byte-IV rows written by the reference's CBC codec still read.
  * The expressions are marked nondeterministic so the optimizer never
  * merges or reorders two encryptions into one.
  */
object KeyCrypto {

  val AesKeyBytes = 16
  val GcmIvBytes = 12
  val GcmTagBits = 128

  /** A resolved set of numbered AES keys (the in-memory face every store
    * loads into; only 16-byte keys with numeric ids participate, matching
    * RotatingAESCodec's filtering). */
  final case class KeyRing(keys: Map[Int, Array[Byte]]) {
    require(keys.nonEmpty, "credential store holds no usable AES keys")
    keys.foreach { case (id, k) =>
      require(k.length == AesKeyBytes, s"key $id is ${k.length} bytes; AES-128 needs $AesKeyBytes") }
    /** Encryption always uses the newest (highest-id) key. */
    def newestId: Int = keys.keys.max
  }

  /** Column face: binary → [keyId int][ivLen int][iv][ciphertext]. */
  def aesEncryptRotating(c: Column, ring: KeyRing): Column =
    GraftColumnShim.column(RotatingAesEncrypt(GraftColumnShim.expression(c), ring))

  /** Column face: self-describing ciphertext → binary (throws on an
    * unknown keyId — a retired key means unreadable data, surface it). */
  def aesDecryptRotating(c: Column, ring: KeyRing): Column =
    GraftColumnShim.column(RotatingAesDecrypt(GraftColumnShim.expression(c), ring))

  /** String-field faces (AvroStringFieldEncryptorConverter semantics —
    * gobblin-modules/gobblin-crypto/.../AvroStringFieldEncryptorConverter
    * .java): string → base64(ciphertext) string, and back. */
  def encryptStringField(c: Column, ring: KeyRing): Column =
    base64(aesEncryptRotating(c.cast("binary"), ring))
  def decryptStringField(c: Column, ring: KeyRing): Column =
    aesDecryptRotating(unbase64(c), ring).cast("string")
}

/** Password-protected JCEKS keystore of numbered secret keys. */
object JceksCredentialStore {

  private def fs(path: Path, conf: org.apache.hadoop.conf.Configuration) =
    path.getFileSystem(conf)

  /** Load the ring; `createIfMissing` materializes an empty keystore
    * (JCEKSKeystoreCredentialStore.CreationOptions.CREATE_IF_MISSING). */
  def load(path: String, password: String,
           createIfMissing: Boolean = false,
           conf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): KeyStore = {
    val p = new Path(path)
    val ks = KeyStore.getInstance("JCEKS")
    val f = fs(p, conf)
    if (f.exists(p)) {
      val in = f.open(p)
      try ks.load(in, password.toCharArray) finally in.close()
    } else if (createIfMissing) {
      ks.load(null, password.toCharArray)
    } else throw new IllegalArgumentException(s"keystore $path does not exist")
    ks
  }

  private def save(ks: KeyStore, path: String, password: String,
                   conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new Path(path)
    val out = fs(p, conf).create(p, true)
    try ks.store(out, password.toCharArray) finally out.close()
  }

  /** Generate and persist a fresh AES-128 key under the next numeric id;
    * returns the new id. */
  def generateKey(path: String, password: String,
                  conf: org.apache.hadoop.conf.Configuration =
                    new org.apache.hadoop.conf.Configuration()): Int = {
    val ks = load(path, password, createIfMissing = true, conf)
    val existing = keyRing(ks, password).map(_.keys.keySet).getOrElse(Set.empty)
    val id = if (existing.isEmpty) 1 else existing.max + 1
    val bytes = new Array[Byte](KeyCrypto.AesKeyBytes)
    new SecureRandom().nextBytes(bytes)
    ks.setEntry(id.toString,
      new KeyStore.SecretKeyEntry(new SecretKeySpec(bytes, "AES")),
      new KeyStore.PasswordProtection(password.toCharArray))
    save(ks, path, password, conf)
    id
  }

  /** All numeric-id 16-byte AES keys in the store as a [[KeyCrypto.KeyRing]]
    * (None when the store has none — callers decide whether that's fatal). */
  def keyRing(ks: KeyStore, password: String): Option[KeyCrypto.KeyRing] = {
    val prot = new KeyStore.PasswordProtection(password.toCharArray)
    val ids = new scala.collection.mutable.HashMap[Int, Array[Byte]]()
    val aliases = ks.aliases()
    while (aliases.hasMoreElements) {
      val alias = aliases.nextElement()
      scala.util.Try(alias.toInt).toOption.foreach { id =>
        ks.getEntry(alias, prot) match {
          case ske: KeyStore.SecretKeyEntry =>
            val enc = ske.getSecretKey.getEncoded
            if (enc != null && enc.length == KeyCrypto.AesKeyBytes)
              ids(id) = enc
          case _ => ()
        }
      }
    }
    if (ids.isEmpty) None else Some(KeyCrypto.KeyRing(ids.toMap))
  }

  def loadRing(path: String, password: String,
               conf: org.apache.hadoop.conf.Configuration =
                 new org.apache.hadoop.conf.Configuration()): KeyCrypto.KeyRing =
    keyRing(load(path, password, createIfMissing = false, conf), password)
      .getOrElse(throw new IllegalStateException(
        s"keystore $path holds no usable AES keys"))
}

/** JSON credential store: `{"1": "<encoded key>", ...}`, hex or base64. */
object JsonCredentialStore {
  sealed trait KeyCodec
  case object Hex extends KeyCodec
  case object B64 extends KeyCodec

  def loadRing(path: String, codec: KeyCodec = Hex,
               conf: org.apache.hadoop.conf.Configuration =
                 new org.apache.hadoop.conf.Configuration()): KeyCrypto.KeyRing = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    val keys = org.json4s.jackson.JsonMethods.parse(text) match {
      case JObject(fields) => fields.collect {
        case (id, JString(enc)) if scala.util.Try(id.toInt).isSuccess =>
          val bytes = codec match {
            case Hex => enc.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
            case B64 => java.util.Base64.getDecoder.decode(enc)
          }
          id.toInt -> bytes
      }.toMap
      case other => throw new IllegalArgumentException(
        s"credential JSON is not an object: $other")
    }
    KeyCrypto.KeyRing(keys.filter(_._2.length == KeyCrypto.AesKeyBytes))
  }
}

/** binary → [keyId][ivLen=12][iv][AES-GCM ciphertext||tag]; fresh random
  * IV per row, newest key. GCM authenticates: flipping any ciphertext
  * bit fails the tag check at decrypt instead of silently corrupting
  * the plaintext (CBC's malleability). Nondeterministic (the IV), so
  * the optimizer never collapses two encryptions of the same
  * plaintext. */
case class RotatingAesEncrypt(child: Expression, ring: KeyCrypto.KeyRing)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "aes_encrypt_rotating"
  override lazy val deterministic: Boolean = false
  @transient private lazy val keyId = ring.newestId
  @transient private lazy val key = new SecretKeySpec(ring.keys(keyId), "AES")
  @transient private lazy val rng = new SecureRandom()
  override protected def nullSafeEval(input: Any): Any = {
    val plain = input.asInstanceOf[Array[Byte]]
    val iv = new Array[Byte](KeyCrypto.GcmIvBytes)
    rng.nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, key,
      new javax.crypto.spec.GCMParameterSpec(KeyCrypto.GcmTagBits, iv))
    val ct = cipher.doFinal(plain)
    val buf = java.nio.ByteBuffer.allocate(8 + iv.length + ct.length)
    buf.putInt(keyId).putInt(iv.length).put(iv).put(ct)
    buf.array()
  }
  override protected def withNewChildInternal(newChild: Expression): RotatingAesEncrypt =
    copy(child = newChild)
}

/** Inverse of [[RotatingAesEncrypt]]: header names the key that wrote the
  * row; an id missing from the ring fails loudly (unreadable data must
  * never pass as nulls), and so does a tampered GCM ciphertext (bad
  * tag). ivLen dispatches the mode — 12 = our GCM rows, 16 = CBC rows
  * written by the reference's RotatingAESCodec (readable for migration,
  * integrity-unchecked by construction). */
case class RotatingAesDecrypt(child: Expression, ring: KeyCrypto.KeyRing)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "aes_decrypt_rotating"
  override protected def nullSafeEval(input: Any): Any = {
    val buf = java.nio.ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    val keyId = buf.getInt
    val ivLen = buf.getInt
    require(ivLen == KeyCrypto.GcmIvBytes || ivLen == 16,
      s"corrupt ciphertext header: ivLen=$ivLen")
    val iv = new Array[Byte](ivLen); buf.get(iv)
    val ct = new Array[Byte](buf.remaining()); buf.get(ct)
    val keyBytes = ring.keys.getOrElse(keyId, throw new IllegalStateException(
      s"ciphertext written with key $keyId, which is not in the credential store"))
    if (ivLen == KeyCrypto.GcmIvBytes) {
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyBytes, "AES"),
        new javax.crypto.spec.GCMParameterSpec(KeyCrypto.GcmTagBits, iv))
      cipher.doFinal(ct)
    } else {
      val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyBytes, "AES"),
        new IvParameterSpec(iv))
      cipher.doFinal(ct)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): RotatingAesDecrypt =
    copy(child = newChild)
}
