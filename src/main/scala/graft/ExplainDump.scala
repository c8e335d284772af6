package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named queries to files —
  * the plan evidence for optimization rounds (`plans/rNN/`). Usage:
  *   runMain graft.ExplainDump <outDir> <sfDir> <query> [query ...]
  * File name is `<query>.txt`; queries whose construction runs eager
  * jobs (fixture writes, persisted operator outputs) still dump the
  * final frame's plan. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir)): Unit
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/$n.txt"), plan): Unit
      println(s"[explain] wrote $outDir/$n.txt")
    }
    spark.stop()
  }
}
