package graft.planning

import java.sql.Timestamp
import java.time.temporal.ChronoUnit
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-extraction planning: split a [low, high] watermark interval
  * into at most `maxPartitions` half-open chunks, each becoming one
  * independent partition read (predicate `wm > lo AND wm <= hi`).
  *
  * Semantics from the reference's Partitioner
  * (gobblin-core/.../partition/Partitioner.java:50,98-167):
  * WatermarkType SIMPLE (numeric) / DATE / HOUR / TIMESTAMP crossed with
  * snapshot vs append extracts; appends get a moving high watermark, and an
  * empty interval preserves the previous watermark
  * (QueryBasedSource.java:195-199).
  *
  * Spark-first: each chunk predicate is pushed into the scan (JDBC
  * `predicates` array or parquet filter pushdown), so planning cost is
  * driver-side only and the read parallelism equals the chunk count.
  */
object WatermarkPartitioner {

  sealed trait WatermarkType
  case object Simple extends WatermarkType      // numeric
  case object DateWm extends WatermarkType      // day granularity
  case object HourWm extends WatermarkType      // hour granularity
  case object TimestampWm extends WatermarkType // second granularity

  /** One half-open chunk (low, high]. Values are type-specific. */
  final case class Chunk[T](low: T, high: T)

  /** Split a numeric interval into at most maxPartitions equal chunks. */
  def splitNumeric(low: Long, high: Long, maxPartitions: Int): Seq[Chunk[Long]] = {
    require(maxPartitions > 0, "maxPartitions must be positive")
    if (high <= low) Nil
    else {
      val n = math.min(maxPartitions.toLong, high - low).toInt
      val step = math.ceil((high - low).toDouble / n).toLong
      (0 until n).flatMap { i =>
        val lo = low + i * step
        val hi = math.min(lo + step, high)
        if (hi > lo) Some(Chunk(lo, hi)) else None
      }
    }
  }

  /** Split a time interval at the granularity implied by the watermark type,
    * into at most maxPartitions chunks (each chunk boundary aligned to whole
    * units where the interval allows). */
  def splitTime(low: Timestamp, high: Timestamp, wmType: WatermarkType,
                maxPartitions: Int): Seq[Chunk[Timestamp]] = {
    val unit = wmType match {
      case DateWm      => ChronoUnit.DAYS
      case HourWm      => ChronoUnit.HOURS
      case TimestampWm => ChronoUnit.SECONDS
      case Simple      => throw new IllegalArgumentException("numeric watermark")
    }
    val lo = low.toInstant
    val hi = high.toInstant
    if (!hi.isAfter(lo)) Nil
    else {
      val units = unit.between(lo, hi) // truncates a partial trailing unit
      val n = math.max(1L, math.min(maxPartitions.toLong, units)).toInt
      val step = math.ceil(math.max(units, 1L).toDouble / n).toLong
      (0 until n).flatMap { i =>
        val cLo = lo.plus(step * i, unit)
        // the LAST chunk always tops out at hi itself: unit-aligned steps
        // would otherwise stop at lo + units (< hi when the interval is
        // not a whole multiple of the unit) and silently lose the rows in
        // (lo + units, hi]
        val cHi =
          if (i == n - 1) hi
          else {
            val cHiRaw = lo.plus(step * (i + 1), unit)
            if (cHiRaw.isAfter(hi)) hi else cHiRaw
          }
        if (cHi.isAfter(cLo)) Some(Chunk(Timestamp.from(cLo), Timestamp.from(cHi)))
        else None
      }
    }
  }

  /** Equi-DEPTH chunking from a value histogram — the reference's
    * Salesforce planner probes a per-day row-count histogram and packs
    * days into chunks of roughly equal record counts, instead of
    * equal-width ranges that skew wildly on bursty data
    * (gobblin-salesforce/.../SalesforceSource.java:272-303).
    *
    * `histogram` is (ordered key, rows-at-key); consecutive keys pack
    * greedily until a chunk reaches targetRowsPerChunk. Returns inclusive
    * (firstKey, lastKey) chunks — each becomes one extraction predicate
    * `key >= first AND key <= last`. */
  def packHistogram[K](histogram: Seq[(K, Long)],
                       targetRowsPerChunk: Long): Seq[(K, K)] = {
    require(targetRowsPerChunk > 0)
    if (histogram.isEmpty) Nil
    else {
      val out = Seq.newBuilder[(K, K)]
      var first = histogram.head._1
      var last = histogram.head._1
      var acc = 0L
      histogram.foreach { case (k, n) =>
        if (acc > 0 && acc + n > targetRowsPerChunk) {
          out += ((first, last)); first = k; acc = 0L
        }
        last = k
        acc += n
      }
      out += ((first, last))
      out.result()
    }
  }

  /** Primary-key range chunking — the reference's Salesforce PK-chunk
    * FALLBACK for tables with no histogram column
    * (SalesforceExtractor.java:97: the bulk API splits extraction by Id
    * ranges when the dynamic-probing histogram path is unavailable):
    * chunk [min, max] into equal-width INCLUSIVE key ranges sized so each
    * holds ~targetRowsPerChunk under uniform key density. Needs only
    * min/max/count — one aggregate probe — and covers the key space
    * exactly once (no gaps, no overlap); skewed key density degrades
    * balance, not correctness, which is exactly the PK-chunk trade. */
  def pkChunks(min: Long, max: Long, count: Long,
               targetRowsPerChunk: Long): Seq[(Long, Long)] = {
    require(targetRowsPerChunk > 0)
    if (count <= 0 || max < min) Nil
    else {
      val span = max - min + 1
      val wanted = math.ceil(count.toDouble / targetRowsPerChunk).toLong
      val n = math.max(1L, math.min(wanted, span)).toInt
      val step = math.ceil(span.toDouble / n).toLong
      (0 until n).flatMap { i =>
        val lo = min + i * step
        val hi = math.min(lo + step - 1, max)
        if (hi >= lo) Some((lo, hi)) else None
      }
    }
  }

  /** PK-chunked scan: probe min/max/count of the key (one aggregate,
    * driver-bounded), then union per-chunk reads whose inclusive range
    * predicates push into the source scan. */
  def pkChunkedScan(df: DataFrame, pkCol: String,
                    targetRowsPerChunk: Long): DataFrame = {
    val row = df.agg(min(col(pkCol)).cast("long"), max(col(pkCol)).cast("long"),
      count(lit(1))).head()
    if (row.isNullAt(0)) df.limit(0)
    else {
      val chunks = pkChunks(row.getLong(0), row.getLong(1), row.getLong(2),
        targetRowsPerChunk)
      chunks.map { case (lo, hi) =>
        df.filter(col(pkCol) >= lit(lo) && col(pkCol) <= lit(hi))
      }.reduce(_ union _)
    }
  }

  /** Chunk -> pushdown predicate on a column: (low, high]. */
  def predicate[T](wmCol: String, c: Chunk[T]): Column =
    col(wmCol) > lit(c.low) && col(wmCol) <= lit(c.high)

  /** Plan + execute an incremental scan: union of per-chunk filtered reads.
    * Each leg's filter is pushed into the source scan; the union is purely
    * logical (no shuffle). */
  def incrementalScan(df: DataFrame, wmCol: String,
                      low: Timestamp, high: Timestamp,
                      wmType: WatermarkType, maxPartitions: Int): DataFrame = {
    val chunks = splitTime(low, high, wmType, maxPartitions)
    chunks.map(c => df.filter(predicate(wmCol, c))) match {
      case Nil  => df.limit(0)
      case legs => legs.reduce(_ union _)
    }
  }
}
