package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionFinderSpec extends SparkSpec {

  private def mkdirs(root: String, rels: Seq[String]): Unit =
    rels.foreach(r => Files.createDirectories(Paths.get(root, r)))

  test("globFor derives the reference's glob from a datetime pattern") {
    assert(VersionFinder.globFor("yyyy/MM/dd") == "*/*/*")
    assert(VersionFinder.globFor("yyyy-MM-dd") == "*")
    assert(VersionFinder.globFor("'d='yyyy-MM-dd") == "*")
  }

  test("dateTimeVersions parses nested date dirs, skips junk") {
    val root = tmpDir("vf-date")
    mkdirs(root, Seq("2024/01/05", "2024/01/06", "2024/02/01",
      "not/a/date", "_tmp/x/y"))
    Files.createFile(Paths.get(root, "2024/01/05/part-0.parquet"))
    val v = VersionFinder.dateTimeVersions(spark, root, "yyyy/MM/dd")
      .orderBy("version_ts").collect()
    assert(v.length == 3)
    assert(v.head.getString(0).endsWith("2024/01/05"))
    assert(v.head.getTimestamp(1).toString == "2024-01-05 00:00:00.0")
    assert(v.last.getString(0).endsWith("2024/02/01"))
  }

  test("dateTimeVersions handles quoted-literal hive-style dirs") {
    val root = tmpDir("vf-hive")
    mkdirs(root, Seq("d=2024-03-01", "d=2024-03-02"))
    val v = VersionFinder.dateTimeVersions(spark, root, "'d='yyyy-MM-dd")
    assert(v.count() == 2)
    assert(v.agg(max("version_ts")).collect().head
      .getTimestamp(0).toString == "2024-03-02 00:00:00.0")
  }

  test("sub-day pattern defaults missing time fields to the floor") {
    val root = tmpDir("vf-hour")
    mkdirs(root, Seq("2024/01/05/07", "2024/01/05/23"))
    val v = VersionFinder.dateTimeVersions(spark, root, "yyyy/MM/dd/HH")
      .orderBy("version_ts").collect()
    assert(v.head.getTimestamp(1).toString == "2024-01-05 07:00:00.0")
    assert(v.last.getTimestamp(1).toString == "2024-01-05 23:00:00.0")
  }

  test("globModTimeVersions versions by modification time") {
    val root = tmpDir("vf-mod")
    mkdirs(root, Seq("snap_a", "snap_b"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(root, "snap_a"), 1000000L, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(root, "snap_b"), 2000000L, -1)
    val v = VersionFinder.globModTimeVersions(spark, root, "snap_*")
      .orderBy("version_ts").collect()
    assert(v.map(_.getTimestamp(1).getTime).toSeq == Seq(1000000L, 2000000L))
    assert(v.head.getString(0).endsWith("snap_a"))
  }

  test("unixTimestampVersions parses epoch names, regex group, skips junk") {
    val root = tmpDir("vf-unix")
    mkdirs(root, Seq("1700000000000", "1700000100000", "not-a-ts",
      "backup-1700000200000-v2"))
    val bare = VersionFinder.unixTimestampVersions(spark, root)
      .orderBy("version_ts").collect()
    assert(bare.length == 2) // regexless: whole name must be numeric
    assert(bare.head.getTimestamp(1).getTime == 1700000000000L)
    val rex = VersionFinder.unixTimestampVersions(spark, root,
      regex = Some("backup-(\\d+)-v\\d+"))
      .collect()
    assert(rex.length == 1)
    assert(rex.head.getTimestamp(1).getTime == 1700000200000L)
  }

  test("fileLevelModTimeVersions finds most-nested paths only") {
    val root = tmpDir("vf-leaf")
    mkdirs(root, Seq("a/b", "a/empty"))
    Files.createFile(Paths.get(root, "a/b/f1.txt"))
    Files.createFile(Paths.get(root, "a/b/f2.txt"))
    Files.createFile(Paths.get(root, "top.txt"))
    val v = VersionFinder.fileLevelModTimeVersions(spark, root)
      .collect().map(_.getString(0)).sorted
    assert(v.length == 4)
    assert(v.exists(_.endsWith("a/b/f1.txt")))
    assert(v.exists(_.endsWith("a/empty"))) // empty dir is its own leaf
    assert(v.exists(_.endsWith("top.txt")))
    assert(!v.exists(_.endsWith("/a"))) // interior dirs are not versions
  }

  test("finder + newestK + deleteVersions is a runnable retention job") {
    val root = tmpDir("vf-retain")
    val days = (1 to 9).map(d => f"2024/01/0$d")
    mkdirs(root, days)
    days.foreach(d =>
      Files.createFile(Paths.get(root, d, "data.txt")))
    val versions = VersionFinder
      .dateTimeVersions(spark, root, "yyyy/MM/dd")
      .withColumn("dataset", lit("t"))
    val survivors = Retention.newestK(
      Seq("dataset"), Seq(col("version_ts").desc), 3)(versions)
    val doomed = Retention.deleteSet(versions, survivors, Seq("path"))
    val deleted = VersionFinder.deleteVersions(spark, doomed)
    assert(deleted.size == 6)
    // the 3 newest day dirs survive with their contents
    val left = VersionFinder.dateTimeVersions(spark, root, "yyyy/MM/dd")
      .collect().map(_.getString(0).takeRight(10)).sorted.toSeq
    assert(left == Seq("2024/01/07", "2024/01/08", "2024/01/09"))
    assert(Files.exists(Paths.get(root, "2024/01/09/data.txt")))
    // idempotent: deleting an already-deleted set is a no-op
    assert(VersionFinder.deleteVersions(spark, doomed).isEmpty)
  }
}
