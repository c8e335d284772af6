package graft.sinks

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class PublisherSpec extends SparkSpec {
  import spark.implicits._

  test("dangling .old park is restored before stage/promote") {
    val out = tmpDir("pub-recover")
    val dst = s"$out/data"
    AtomicPublisher.publish(Seq(1, 2, 3).toDF("v"), dst, "r1")
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // simulate a crash between promote's two renames: previous output is
    // parked in .old-data and nothing sits at the final path
    assert(fs.rename(new Path(dst), new Path(s"$out/.old-data")))
    assert(!fs.exists(new Path(dst)))
    AtomicPublisher.recoverDangling(fs, new Path(dst))
    assert(spark.read.parquet(dst).count() == 3)

    // a full publish after such a crash heals the gap, then replaces —
    // including a retry reusing the SAME runId as the crashed promote
    assert(fs.rename(new Path(dst), new Path(s"$out/.old-data")))
    AtomicPublisher.publish(Seq(9, 9).toDF("v"), dst, "r1")
    assert(spark.read.parquet(dst).count() == 2)
    val leftovers = fs.listStatus(new Path(out)).map(_.getPath.getName)
      .filter(n => n.startsWith(".old-") || n.startsWith(".staging-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("a sibling destination's park is never restored to this destination") {
    val out = tmpDir("pub-sibling")
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // `raw-events` crashed mid-promote, leaving its park; `events` has
    // never been published — recovery for `events` must NOT adopt it
    AtomicPublisher.publish(Seq(7).toDF("v"), s"$out/raw-events", "r1")
    assert(fs.rename(new Path(s"$out/raw-events"),
      new Path(s"$out/.old-raw-events")))
    AtomicPublisher.recoverDangling(fs, new Path(s"$out/events"))
    assert(!fs.exists(new Path(s"$out/events")))
    assert(fs.exists(new Path(s"$out/.old-raw-events")))
    // and raw-events itself still heals
    AtomicPublisher.recoverDangling(fs, new Path(s"$out/raw-events"))
    assert(spark.read.parquet(s"$out/raw-events").count() == 1)
  }

  test("keepBackup retains the displaced output; restoreBackup swaps it back once") {
    val dir = tmpDir("pub-backup") + "/ds"
    AtomicPublisher.publish(Seq(1, 2, 3).toDF("v"), dir, "r1")
    // a bad publish (the purge-gone-wrong shape) with the backup kept
    AtomicPublisher.publish(Seq(99).toDF("v"), dir, "r2",
      AtomicPublisher.WriteSpec(keepBackup = true))
    assert(spark.read.parquet(dir).count() == 1)
    // the deliberate restore: last-known-good comes back
    AtomicPublisher.restoreBackup(spark, dir)
    assert(spark.read.parquet(dir).collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3))
    // one restore consumes the backup — a second refuses loudly
    val e = intercept[IllegalArgumentException] {
      AtomicPublisher.restoreBackup(spark, dir)
    }
    assert(e.getMessage.contains("no backup"), e.getMessage)
    // a publish WITHOUT keepBackup leaves nothing to restore
    AtomicPublisher.publish(Seq(5).toDF("v"), dir, "r3")
    intercept[IllegalArgumentException] {
      AtomicPublisher.restoreBackup(spark, dir)
    }
  }
}
