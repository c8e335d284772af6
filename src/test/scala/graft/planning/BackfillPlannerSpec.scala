package graft.planning

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BackfillPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def writeDays(dir: String, days: Seq[String]): Unit =
    days.zipWithIndex.toDF("dt", "n")
      .write.mode("overwrite").partitionBy("dt").parquet(dir)

  test("holes between present bounds are reported, edges are not holes") {
    val dir = tmpDir("backfill") + "/tbl"
    writeDays(dir, Seq("2024-03-01", "2024-03-02", "2024-03-05", "2024-03-07"))
    val got = BackfillPlanner.missingDates(spark, dir, "dt")
      .as[String].collect().toSeq.sorted
    assert(got == Seq("2024-03-03", "2024-03-04", "2024-03-06"))
  }

  test("explicit bounds catch missing range edges") {
    val dir = tmpDir("backfill-edge") + "/tbl"
    writeDays(dir, Seq("2024-03-02", "2024-03-03"))
    val got = BackfillPlanner.missingDates(spark, dir, "dt",
      from = Some("2024-03-01"), to = Some("2024-03-05"))
      .as[String].collect().toSeq.sorted
    assert(got == Seq("2024-03-01", "2024-03-04", "2024-03-05"))
  }

  test("complete table plans nothing; unparseable dirs are skipped") {
    val dir = tmpDir("backfill-full") + "/tbl"
    writeDays(dir, Seq("2024-03-01", "2024-03-02"))
    // a non-date partition dir must not break planning
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "dt=not-a-date"))
    assert(BackfillPlanner.missingDates(spark, dir, "dt").isEmpty)
  }

  test("empty dir without bounds is refused") {
    val dir = tmpDir("backfill-empty") + "/tbl"
    intercept[IllegalArgumentException] {
      BackfillPlanner.missingDates(spark, dir, "dt")
    }
  }
}
