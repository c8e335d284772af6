package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) curve value: interleave the low `bits` bits of each
  * input rank round-robin, so that sorting by the single output long
  * co-locates rows that are close in EVERY input dimension at once.
  *
  * This is the multi-dimensional generalization of the single-column
  * range clustering [[graft.sources.StatsPrunedSource]] writes: one
  * `repartitionByRange` on the z-value gives every data file a tight
  * (min, max) envelope on ALL z-ordered columns simultaneously, so a
  * box probe (ts range AND key range) can skip files on both predicates
  * where a one-column sort order only ever skips on its leading column.
  * The reference has no data-skipping layer at all (its HiveRegister
  * prunes whole partitions only); this is the Iceberg/Delta Z-ORDER
  * idea re-expressed as a native expression + the sidecar-stats pattern.
  *
  * Inputs are pre-scaled non-negative ranks (see
  * [[graft.sources.ZOrderSource.rankCol]]); values outside
  * [0, 2^bits) clamp, which can only loosen the layout, never corrupt
  * a result (pruning correctness is carried by the residual filter,
  * not the curve).
  */
case class ZInterleave(children: Seq[Expression], bits: Int)
    extends Expression with CodegenFallback {
  require(children.nonEmpty, "z-order needs at least one column")
  require(bits > 0 && children.size * bits <= 63,
    s"dims*bits must fit a positive long: ${children.size} * $bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "z_interleave"
  private val dims = children.size
  private val maxRank = (1L << bits) - 1
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < dims) {
      val raw = children(d).eval(input)
      // NULL ranks sort first (rank 0): deterministic, and the residual
      // filter drops them from any box probe anyway.
      val v0 = if (raw == null) 0L else raw.asInstanceOf[Long]
      val v = if (v0 < 0L) 0L else if (v0 > maxRank) maxRank else v0
      var b = 0
      while (b < bits) {
        z |= ((v >>> b) & 1L) << (b * dims + d)
        b += 1
      }
      d += 1
    }
    z
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZInterleave =
    copy(children = newChildren)
}

object ZCurve {
  /** The z-value column for pre-scaled long ranks. */
  def zValue(ranks: Seq[Column], bits: Int): Column =
    GraftColumnShim.column(
      ZInterleave(ranks.map(GraftColumnShim.expression), bits))
}
