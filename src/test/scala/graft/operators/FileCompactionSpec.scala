package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FileCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def writeScattered(dir: String, filesPerPartition: Int): Unit = {
    val ev = Tables.load(spark, sf, "events")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    ev.repartition(filesPerPartition)
      .write.partitionBy("dt").parquet(dir)
  }

  test("compaction shrinks files and preserves every row") {
    val dir = tmpDir("compact") + "/tbl"
    writeScattered(dir, 6)
    val beforeRows = spark.read.parquet(dir)
      .select("event_id").as[Long].collect().sorted.toSeq
    val stats = FileCompaction.compact(spark, dir, "dt",
      targetBytes = 512L * 1024 * 1024)
    assert(stats.rewritten.nonEmpty)
    assert(stats.filesAfter < stats.filesBefore)
    val after = FileCompaction.audit(spark, dir, "dt", 512L * 1024 * 1024)
    assert(after.forall(_.files == 1), s"tiny partitions compact to one file: $after")
    val afterRows = spark.read.parquet(dir)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(afterRows == beforeRows)
  }

  test("second run is a no-op that rewrites nothing") {
    val dir = tmpDir("compact-idem") + "/tbl"
    writeScattered(dir, 4)
    FileCompaction.compact(spark, dir, "dt", 512L * 1024 * 1024)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileNames(): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .filter(_.isDirectory)
        .flatMap(d => fs.listStatus(d.getPath).toSeq.map(_.getPath.toString))
        .toSet
    val names = fileNames()
    val stats2 = FileCompaction.compact(spark, dir, "dt", 512L * 1024 * 1024)
    assert(stats2.rewritten.isEmpty)
    assert(stats2.filesBefore == stats2.filesAfter)
    assert(fileNames() == names, "a no-op run must not touch any file")
  }

  test("already-compacted partitions are not rewritten") {
    val root = tmpDir("compact-partial")
    val dir = s"$root/tbl"
    val ev = Tables.load(spark, sf, "events")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    // one partition pre-compacted to a single file, the rest scattered
    val compactDt = "2024-01-05"
    ev.filter(col("dt") === compactDt).coalesce(1)
      .write.partitionBy("dt").parquet(dir)
    ev.filter(col("dt") =!= compactDt).repartition(5)
      .write.mode("append").partitionBy("dt").parquet(dir)
    val stats = FileCompaction.compact(spark, dir, "dt", 512L * 1024 * 1024)
    assert(!stats.rewritten.contains(s"dt=$compactDt"))
    assert(stats.rewritten.nonEmpty)
  }

  test("audit reports files, bytes and targets per partition") {
    val dir = tmpDir("compact-audit") + "/tbl"
    writeScattered(dir, 3)
    val layouts = FileCompaction.audit(spark, dir, "dt", 1L)
    // targetBytes=1 -> every partition already needs >= its file count
    assert(layouts.nonEmpty)
    assert(layouts.forall(p => p.files == 3 && p.bytes > 0))
    // absurdly small target: targetFiles = bytes, no partition "needs" it
    assert(layouts.forall(!_.needsCompaction))
  }
}
