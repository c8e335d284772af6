package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata layout: one parquet file per table
  * under an sf directory (see /root/repo/TESTDATA.md).
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects; we read it as a nanos-long
  * (spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
  * timestamp with integer arithmetic (no double round-trip — ns since 2024
  * exceeds double's 53-bit mantissa).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Convert any nanos-long "ts" column produced by nanosAsLong. */
  def normalizeTs(df: DataFrame, cols: Seq[String] = Seq("ts")): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
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
