package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query by name against an sf dir, print
  * timing + row count (and optionally the plan / rows). Usage:
  *   runMain graft.RunQuery <queryName> <sfDir> [show|explain|dump:<path>]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val extra = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (extra.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[runquery] $name rows=$n%d time=$secs%.2fs")
    if (extra.contains("twice")) {
      val df2 = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val n2 = df2.count()
      val secs2 = (System.nanoTime() - t1) / 1e9
      println(f"[runquery] $name warm rows=$n2%d time=$secs2%.2fs")
    }
    if (extra.contains("show")) df.show(50, truncate = false)
    extra.find(_.startsWith("dump:")).foreach { d =>
      df.coalesce(1).write.mode("overwrite").parquet(d.stripPrefix("dump:"))
    }
    spark.stop()
  }
}
