package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("sweeps protocol leftovers, never data or sidecars") {
    val dir = tmpDir("vacuum") + "/tbl"
    Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "dt")
      .write.partitionBy("dt").parquet(dir)
    // crash debris at root and inside a partition dir
    fs.mkdirs(new Path(dir, ".merge-staging/dt=2024-01-01"))
    fs.mkdirs(new Path(dir, ".compact-staging"))
    fs.mkdirs(new Path(dir, "dt=2024-01-01/.staging-run1-part"))
    fs.mkdirs(new Path(dir, "dt=2024-01-01/.old-part"))
    fs.mkdirs(new Path(dir, ".undone-tbl")) // restoreBackup forensic park
    fs.mkdirs(new Path(dir, "_graft_stats")) // sidecar: must survive
    // the DEFAULT must keep these just-created dirs (live-job grace) —
    // sweep-everything needs the explicit 0
    val graceStats = Vacuum.sweepStaging(spark, dir)
    assert(graceStats.removed.isEmpty && graceStats.kept.size == 5,
      s"default grace must protect fresh staging dirs: $graceStats")
    val stats = Vacuum.sweepStaging(spark, dir, olderThanMs = 0L)
    assert(stats.removed.size == 5, stats.removed.mkString(","))
    assert(fs.exists(new Path(dir, "_graft_stats")))
    assert(!fs.exists(new Path(dir, ".merge-staging")))
    assert(!fs.exists(new Path(dir, ".undone-tbl")))
    assert(!fs.exists(new Path(dir, "dt=2024-01-01/.staging-run1-part")))
    // table still reads
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("grace period keeps young staging dirs (live job protection)") {
    val dir = tmpDir("vacuum-grace") + "/tbl"
    fs.mkdirs(new Path(dir, ".staging-live-part"))
    val stats = Vacuum.sweepStaging(spark, dir, olderThanMs = 3600000L)
    assert(stats.removed.isEmpty && stats.kept.size == 1)
    assert(fs.exists(new Path(dir, ".staging-live-part")))
    // past the grace period it goes
    val stats2 = Vacuum.sweepStaging(spark, dir, olderThanMs = 0L)
    assert(stats2.removed.size == 1)
  }

  test("missing dir is a no-op") {
    val stats = Vacuum.sweepStaging(spark, "/tmp/graft-vacuum-nonexistent")
    assert(stats.removed.isEmpty && stats.kept.isEmpty)
  }
}
