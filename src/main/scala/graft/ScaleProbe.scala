package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{DupClusters, MinHashDedup}

/** Dev tool: scale the near-dup dedup pipeline beyond the test SFs by
  * replicating the documents table K times with shifted ids, and time
  * candidate generation -> exact verify -> cluster resolution. Usage:
  *   runMain graft.ScaleProbe <sfDir> <replication>
  * (each replica duplicates every document, so true near-dup pairs grow
  * ~K^2 within each content group — a stress test for bucket skew, not
  * just volume).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sfDir, "documents")
    val n0 = base.count()
    val docs = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
        col("text"))).reduce(_ union _)
      .repartition(cpus.toInt).persist()
    val n = docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val cands = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      n = 3, k = 32, numBands = 16).persist()
    val nc = time(s"candidates over $n docs (${k}x of $n0)")(cands.count())
    val verified = MinHashDedup.verifyShingleJaccard(
      cands, docs, "doc_id", "text", n = 3, threshold = 0.5).persist()
    val nv = time("exact verify")(verified.count())
    val clusters = time("cluster resolution")(
      DupClusters.resolve(docs, "doc_id", verified.select("id_a", "id_b"))
        .agg(countDistinct(col("cluster_id"))).head.getLong(0))
    println(s"[scaleprobe] docs=$n candidates=$nc verified=$nv clusters=$clusters")
    spark.stop()
  }
}
