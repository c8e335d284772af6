package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native minhash signature / LSH band hashing as a Catalyst expression.
  *
  * Why an Expression and not higher-order functions: the HOF formulation
  * (`aggregate` over `transform`ed shingles with nested lambdas) is
  * interpreted per element — per shingle it allocates an accumulator array
  * and boxes k lambda evaluations, and the deep lambda tree also costs
  * seconds of analysis/codegen at plan time. One `eval` per row doing the
  * whole signature in primitive arrays is ~10x cheaper and collapses the
  * plan to a single node. (Preference order per the build brief: compose
  * built-ins > custom Expression > mapPartitions.)
  *
  * Token/shingle semantics match `split(text, " ")` + `concat_ws(" ", …)`:
  * single-space separators, empty tokens preserved. Because shingles are
  * space-joined runs of tokens, every shingle is a byte range of the
  * original UTF-8 text — hashed in place, no string materialization.
  * Short docs (< n tokens) hash the whole text as one shingle.
  */
private[graft] object MinHashCore {

  /** k running minima of per-shingle hashes: mins[i] = min over shingles of
    * xxhash64_seed_i(xxhash64(shingleBytes)). */
  def minima(text: UTF8String, n: Int, k: Int): Array[Long] = {
    val bytes = text.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val m = spaces + 1 // token count under single-space split
    val starts = new Array[Int](m + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(m) = bytes.length + 1 // sentinel: "space" one past the end

    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)

    def update(start: Int, endExcl: Int): Unit = {
      val base = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, endExcl - start, 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(base, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }

    if (m < n) update(0, bytes.length)
    else {
      var s = 0
      while (s + n <= m) {
        // tokens s .. s+n-1 = bytes [starts(s), starts(s+n) - 1)
        update(starts(s), starts(s + n) - 1)
        s += 1
      }
    }
    mins
  }

  /** Fold the k-wide minima into numBands band hashes (r = k/numBands
    * consecutive signature entries chained per band). */
  def bandHashes(mins: Array[Long], numBands: Int): Array[Long] = {
    val r = mins.length / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 42L + b
      var j = b * r
      val end = j + r
      while (j < end) { h = XXH64.hashLong(mins(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}

/** array<bigint> of k minhash values for a text column. */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashCore.minima(input.asInstanceOf[UTF8String], n, k))
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** array<bigint> of numBands LSH band hashes for a text column — the
  * signature never materializes in the plan. */
case class MinHashBandHashes(child: Expression, n: Int, k: Int, numBands: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && k > 0 && numBands > 0 && k % numBands == 0,
    s"k=$k must divide into numBands=$numBands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashCore.bandHashes(
      MinHashCore.minima(input.asInstanceOf[UTF8String], n, k), numBands))
  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

object MinHash {
  def signature(text: Column, n: Int, k: Int): Column =
    GraftColumnShim.column(MinHashSignature(GraftColumnShim.expression(text), n, k))

  def bandHashes(text: Column, n: Int, k: Int, numBands: Int): Column =
    GraftColumnShim.column(MinHashBandHashes(GraftColumnShim.expression(text), n, k, numBands))
}
