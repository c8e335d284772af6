package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata layout: one parquet file per table
  * under an sf directory (see /root/repo/TESTDATA.md).
  *
  * `events.ts` has shipped in two physical shapes across driver rounds:
  *  - parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects —
  *    read as a nanos-long (spark.sql.legacy.parquet.nanosAsLong) and
  *    convert with integer arithmetic (no double round-trip: ns since
  *    2024 exceeds double's 53-bit mantissa);
  *  - parquet timestamp[us] with no timezone, which Spark 4 infers as
  *    TIMESTAMP_NTZ. Pure comparisons tolerate NTZ, but `withWatermark`
  *    and `unix_micros` reject it, so it is cast to TIMESTAMP here at the
  *    source. Every entry point pins spark.sql.session.timeZone=UTC, so
  *    the cast is lossless and agrees with the DuckDB oracle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize a "ts" column to TIMESTAMP: nanos-long (nanosAsLong) via
    * integer division, TIMESTAMP_NTZ via a cast (UTC session → lossless). */
  def normalizeTs(df: DataFrame, cols: Seq[String] = Seq("ts")): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (!d.columns.contains(c)) d
      else d.schema(c).dataType match {
        case LongType =>
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case TimestampNTZType =>
          d.withColumn(c, col(c).cast(TimestampType))
        case _ => d
      }
    }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    enableNanos(spark)
    normalizeTs(spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  /** Streaming replay of a testdata table (file-stream stand-in for Kafka).
    * FileStreamSource consumes directories, so the single table file is
    * staged into a temp directory first (tiny, driver-side, idempotent). */
  def loadStream(spark: SparkSession, sfDir: String, table: String,
                 maxFilesPerTrigger: Int = 1): DataFrame = {
    enableNanos(spark)
    val src = s"$sfDir/$table.parquet"
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-stream",
      sfDir.replaceAll("[^A-Za-z0-9.]", "_"), table)
    java.nio.file.Files.createDirectories(dir)
    val dst = dir.resolve(s"$table.parquet")
    if (!java.nio.file.Files.exists(dst))
      java.nio.file.Files.copy(java.nio.file.Paths.get(src), dst)
    val raw = spark.read.parquet(src).schema // pre-conversion schema
    normalizeTs(spark.readStream.schema(raw)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(dir.toString))
  }
}
