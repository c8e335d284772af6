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
    // parked in .old-<runId>-data and nothing sits at the final path
    assert(fs.rename(new Path(dst), new Path(s"$out/.old-r2-data")))
    assert(!fs.exists(new Path(dst)))
    AtomicPublisher.recoverDangling(fs, new Path(dst))
    assert(spark.read.parquet(dst).count() == 3)

    // a full publish after such a crash heals the gap, then replaces —
    // including a retry reusing the SAME runId as the crashed promote
    assert(fs.rename(new Path(dst), new Path(s"$out/.old-r3-data")))
    AtomicPublisher.publish(Seq(9, 9).toDF("v"), dst, "r3")
    assert(spark.read.parquet(dst).count() == 2)
    val leftovers = fs.listStatus(new Path(out)).map(_.getPath.getName)
      .filter(n => n.startsWith(".old-") || n.startsWith(".staging-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
