package graft.sources

import graft.SparkSpec
import graft.sources.GoogleIngestion._

class GoogleIngestionSpec extends SparkSpec {

  private def newSim(reportCsv: String => String = _ => "k,v\n1,a\n",
                     polls: Int = 2): GoogleApiSim =
    new GoogleApiSim("tok-123", reportCsv, polls)

  private def driveCfg(sim: GoogleApiSim, pageSize: Int = 100) =
    DriveConfig(sim.baseUrl, "tok-123", pageSize = pageSize)

  private val http = java.net.http.HttpClient.newHttpClient()

  test("Drive ls: recursive, folders excluded, paged listing, missing folder empty") {
    val sim = newSim()
    try {
      sim.addFolder("d1", "drop")
      sim.addFolder("d2", "inner", parent = "d1")
      (1 to 5).foreach(i =>
        sim.addFile(s"f$i", s"f$i.csv", s"k,v\n$i,x\n", "d1", 1000L * i))
      sim.addFile("f9", "nested.csv", "k,v\n9,z\n", "d2", 9000L)
      // pageSize 2 forces 3 pages for d1's 6 children
      val cfg = driveCfg(sim, pageSize = 2)
      val all = DriveClient.lsRecursive(http, cfg, "d1")
      assert(all.map(_.id).sorted == Seq("f1", "f2", "f3", "f4", "f5", "f9"))
      assert(all.forall(!_.isFolder))
      assert(all.find(_.id == "f1").get.size == "k,v\n1,x\n".length.toLong)
      // GoogleDriveFsHelper.ls contract: a missing folder is EMPTY, not
      // an error
      assert(DriveClient.lsRecursive(http, cfg, "nope").isEmpty)
    } finally sim.stop()
  }

  test("Drive: a wrong bearer token is refused, loudly") {
    val sim = newSim()
    try {
      sim.addFolder("d1", "drop")
      val bad = DriveConfig(sim.baseUrl, "wrong-token")
      val e = intercept[Exception] { DriveClient.list(http, bad, "d1") }
      assert(e.getMessage.contains("401"), e.getMessage)
    } finally sim.stop()
  }

  test("Drive incremental plan: fetch, empty second run, changed file re-extracts") {
    val sim = newSim()
    try {
      sim.addFolder("d1", "drop")
      sim.addFile("fa", "a.csv", "k,v\n1,a\n2,b\n", "d1", 1000L)
      sim.addFile("fb", "b.csv", "k,v\n3,c\n", "d1", 2000L)
      val state = tmpDir("gdrive-state")
      val staging = tmpDir("gdrive-staging")
      def planOnce() = GoogleDriveSource.plan(spark, driveCfg(sim), "d1",
        state, "drop", staging, format = "csv",
        options = Map("header" -> "true"))
      val p1 = planOnce()
      assert(p1.newFiles.map(_.id).sorted == Seq("fa", "fb"))
      assert(p1.df.count() == 3)
      p1.commit()
      val p2 = planOnce()
      assert(p2.newFiles.isEmpty && p2.df.count() == 0)
      assert(p2.df.columns.toSeq == Seq("k", "v"))
      sim.addFile("fb", "b.csv", "k,v\n3,c\n4,d\n", "d1", 3000L)
      val p3 = planOnce()
      assert(p3.newFiles.map(_.id) == Seq("fb") && p3.df.count() == 2)
    } finally sim.stop()
  }

  test("Drive staging is byte-exact for binary (non-UTF-8) files") {
    // review finding: download-as-String UTF-8-decoded the payload,
    // corrupting any invalid sequence (parquet, gzip). A gzip member
    // with high bytes must round-trip bit-for-bit.
    val sim = newSim()
    try {
      sim.addFolder("d1", "drop")
      val bytes = Array.tabulate[Byte](512)(i => ((i * 31 + 7) % 256).toByte)
      sim.addBinaryFile("fbin", "blob.bin", bytes, "d1", 1000L)
      val got = DriveClient.downloadBytes(http, driveCfg(sim), "fbin")
      assert(java.util.Arrays.equals(got, bytes),
        "binary content must survive the wire byte-exactly")
      // and the planner stages it byte-exactly too
      val staging = tmpDir("gdrive-bin-staging")
      GoogleDriveSource.plan(spark, driveCfg(sim), "d1",
        tmpDir("gdrive-bin-state"), "bin", staging, format = "binaryFile")
      // staged under the constant safe prefix (hidden-file hazard: a
      // Drive id may begin with '_')
      val staged = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(staging, "d-fbin"))
      assert(java.util.Arrays.equals(staged, bytes))
    } finally sim.stop()
  }

  test("an empty Drive folder plans an empty delta instead of crashing") {
    val sim = newSim()
    try {
      sim.addFolder("d1", "drop")
      val p = GoogleDriveSource.plan(spark, driveCfg(sim), "d1",
        tmpDir("gdrive-empty-state"), "e", tmpDir("gdrive-empty-staging"),
        format = "csv")
      assert(p.newFiles.isEmpty && p.df.count() == 0)
    } finally sim.stop()
  }

  test("GA unsampled: insert -> PENDING polls -> COMPLETED -> Drive CSV; " +
      "temp report deleted; watermark = endDate + 1 day") {
    val sim = newSim(title => s"ga_date,sessions\n20240101,$title-7\n", polls = 3)
    try {
      val res = GoogleAnalyticsUnsampled.extract(spark,
        GaConfig(sim.baseUrl, "tok-123", pollIntervalMs = 5),
        driveCfg(sim),
        GaRequest("a1", "w1", "v1", "daily", "2024-01-01", "2024-01-31",
          metrics = "ga:sessions"),
        stagingDir = tmpDir("ga-staging"))
      assert(sim.statusPolls >= 2, "must poll through PENDING states")
      val rows = res.df.collect()
      assert(rows.length == 1 && rows(0).getString(1) == "daily-7")
      // WATERMARK_INPUTFORMAT yyyyMMddHHmmss of endDate + 1 day
      assert(res.nextWatermark == 20240201000000L)
      // the temp unsampled report was deleted from Drive after staging
      assert(!sim.hasFile(res.driveFileId),
        "temp report must be deleted (the extractor's default)")
    } finally sim.stop()
  }

  test("GA unsampled: FAILED status refuses immediately, no polling") {
    val sim = newSim()
    try {
      val e = intercept[IllegalArgumentException] {
        GoogleAnalyticsUnsampled.extract(spark,
          GaConfig(sim.baseUrl, "tok-123", pollIntervalMs = 5),
          driveCfg(sim),
          GaRequest("a1", "w1", "v1", "fail-me", "2024-01-01", "2024-01-31",
            metrics = "ga:sessions"),
          stagingDir = tmpDir("ga-staging-fail"))
      }
      assert(e.getMessage.contains("non-transient"), e.getMessage)
      assert(sim.statusPolls == 0, "FAILED must not be polled or retried")
    } finally sim.stop()
  }
}
