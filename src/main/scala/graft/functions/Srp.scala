package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sign-random-projection signatures for all LSH tables in ONE pass over
  * the vector — the bucketing primitive of [[graft.ann.Ann.lshTopK]].
  *
  * signature(t) bit p = sign( Σ_i v_i * h(t,p,i) ), h = ±1 from
  * xxhash64(t,p,i) — deterministic pseudo-random hyperplanes, no stored
  * projection matrix (same contract as the HOF formulation it replaces).
  *
  * Why native: the higher-order-function version evaluated
  * tables × bits × dim interpreted lambda nodes per row (~4k boxed hash
  * calls for 16 tables × 4 bits × 64 dims) and its nested lambda tree
  * dominated q29's plan-compile time; this expression runs the same
  * arithmetic in a primitive loop, one eval per row.
  */
case class SrpSignatures(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 63 && tables > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_signatures"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = toDouble(arr, i); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        var proj = 0.0
        var d = 0
        while (d < n) {
          // ±1 hyperplane component for (table, plane, dim)
          val h = XXH64.hashLong(
            (t.toLong << 40) ^ (p.toLong << 20) ^ d.toLong, 42L)
          proj += (if ((h & 1L) == 0L) v(d) else -v(d))
          d += 1
        }
        if (proj >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
  private def toDouble(arr: ArrayData, i: Int): Double =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) => arr.getFloat(i).toDouble
      case ArrayType(org.apache.spark.sql.types.DoubleType, _) => arr.getDouble(i)
      case ArrayType(org.apache.spark.sql.types.LongType, _) => arr.getLong(i).toDouble
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => arr.getInt(i).toDouble
      case other => throw new IllegalArgumentException(s"srp over $other")
    }
  override protected def withNewChildInternal(newChild: Expression): SrpSignatures =
    copy(child = newChild)
}

object Srp {
  /** array<bigint> of `tables` signatures (bits wide each). */
  def signatures(vec: Column, bits: Int, tables: Int): Column =
    GraftColumnShim.column(SrpSignatures(GraftColumnShim.expression(vec), bits, tables))
}
