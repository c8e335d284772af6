package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Record-payload codecs — the reference's StreamCodec surface
  * (gobblin-api/.../codec/StreamCodec.java; EncryptionFactory under
  * gobblin-core-base/.../crypto/): gzip compress/decompress as native
  * expressions, AES via Spark's built-in aes_encrypt/aes_decrypt
  * (GCM, codegen'd).
  *
  * The reference codecs wrap record byte streams per task; here they are
  * column expressions over binary payloads — map-only, no shuffle, usable
  * anywhere in a converter chain.
  */
object Codecs {

  /** binary -> gzipped binary. */
  def gzip(c: Column): Column =
    GraftColumnShim.column(GzipCompress(GraftColumnShim.expression(c)))

  /** gzipped binary -> binary. */
  def gunzip(c: Column): Column =
    GraftColumnShim.column(GzipDecompress(GraftColumnShim.expression(c)))

  /** AES-GCM with a string key (16/24/32 bytes) — Spark built-ins. */
  def aesEncrypt(c: Column, key: String): Column =
    aes_encrypt(c, lit(key))
  def aesDecrypt(c: Column, key: String): Column =
    aes_decrypt(c, lit(key))
}

case class GzipCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 32)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
}

case class GzipDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gunzip"
  override protected def nullSafeEval(input: Any): Any = {
    val in = new GZIPInputStream(
      new java.io.ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): GzipDecompress =
    copy(child = newChild)
}
