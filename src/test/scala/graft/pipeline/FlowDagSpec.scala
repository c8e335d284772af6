package graft.pipeline

import graft.SparkSpec

class FlowDagSpec extends SparkSpec {

  private def leafSpec(name: String, in: String, out: String,
                       filter: Option[String] = None) =
    PipelineSpec(name = name,
      source = SourceSpec(format = "parquet", path = in),
      branches = Seq(BranchSpec(name = "main", filterExpr = filter,
        outDir = out)))

  test("topoOrder respects dependencies, keeps declaration order for ties") {
    val a = FlowDag.FlowNode(leafSpec("a", "/i", "/o"))
    val b = FlowDag.FlowNode(leafSpec("b", "/i", "/o"), dependsOn = Seq("a"))
    val c = FlowDag.FlowNode(leafSpec("c", "/i", "/o"), dependsOn = Seq("a"))
    val d = FlowDag.FlowNode(leafSpec("d", "/i", "/o"), dependsOn = Seq("b", "c"))
    // declaration order (d, c, b, a) breaks the b/c tie: c was declared
    // before b, so it runs first
    val order = FlowDag.topoOrder(Seq(d, c, b, a)).map(_.name)
    assert(order == Seq("a", "c", "b", "d"))
  }

  test("cycles and unknown deps are rejected loudly") {
    val a = FlowDag.FlowNode(leafSpec("a", "/i", "/o"), dependsOn = Seq("b"))
    val b = FlowDag.FlowNode(leafSpec("b", "/i", "/o"), dependsOn = Seq("a"))
    val e1 = intercept[IllegalArgumentException](FlowDag.topoOrder(Seq(a, b)))
    assert(e1.getMessage.contains("cycle"))
    val c = FlowDag.FlowNode(leafSpec("c", "/i", "/o"), dependsOn = Seq("nope"))
    val e2 = intercept[IllegalArgumentException](FlowDag.topoOrder(Seq(c)))
    assert(e2.getMessage.contains("unknown job"))
  }

  test("two-hop flow hands published output to the downstream job") {
    val dir = tmpDir("flowdag")
    val nodes = FlowDag.fromProperties(Map(
      "flow.name" -> "two-hop",
      "job.1.job.name" -> "extract",
      "job.1.source.format" -> "parquet",
      "job.1.source.path" -> s"$sf/orders.parquet",
      "job.1.transform.1" -> "selectExpr:o_orderkey;o_orderstatus;o_totalprice",
      "job.1.fork.1.name" -> "main",
      "job.1.fork.1.out" -> s"$dir/hop1",
      "job.2.job.name" -> "load",
      "job.2.dependsOn" -> "extract",
      "job.2.source.format" -> "parquet",
      "job.2.source.path" -> s"$dir/hop1",
      "job.2.fork.1.name" -> "main",
      "job.2.fork.1.filter" -> "o_orderstatus = 'F'",
      "job.2.fork.1.out" -> s"$dir/hop2"))
    assert(nodes.map(_.name) == Seq("extract", "load"))
    assert(nodes(1).dependsOn == Seq("extract"))

    val res = FlowDag.run(spark, nodes, "flowrun1")
    assert(res("extract").status == FlowDag.Succeeded)
    assert(res("load").status == FlowDag.Succeeded)
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderstatus = 'F'").count()
    assert(spark.read.parquet(s"$dir/hop2").count() == expected)
    assert(res("load").result.get.branchCounts("main") == expected)
  }

  test("maintenance hops (compact-files, vacuum) schedule from properties like ETL hops") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("flowdag-maint")
    val tbl = s"$dir/tbl"
    // a small-file-heavy partitioned table + crash debris to sweep
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .repartition(8)
      .write.partitionBy("dt").parquet(tbl)
    val fsys = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.mkdirs(new org.apache.hadoop.fs.Path(tbl, ".staging-dead-run"))
    val before = spark.read.parquet(tbl).count()
    def dataFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(tbl)).count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = dataFiles()
    assert(filesBefore > 10, s"need a small-file table, got $filesBefore")

    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val nodes = FlowDag.fromProperties(Map(
      "flow.name" -> "nightly-maintenance",
      "job.1.job.name" -> "compact",
      "job.1.job.type" -> "compact-files",
      "job.1.dir" -> tbl,
      "job.1.partition.col" -> "dt",
      "job.1.target.bytes" -> (64L * 1024 * 1024).toString,
      "job.2.job.name" -> "sweep",
      "job.2.job.type" -> "vacuum",
      "job.2.dependsOn" -> "compact",
      "job.2.dir" -> tbl,
      "job.2.grace.ms" -> "0"))
    assert(nodes.map(_.name) == Seq("compact", "sweep"))
    val res = FlowDag.run(spark, nodes, "maintrun", ledger = Some(ledger))
    assert(res("compact").status == FlowDag.Succeeded)
    assert(res("sweep").status == FlowDag.Succeeded)
    // compaction shrank the file count without changing the data
    assert(dataFiles() < filesBefore, s"$filesBefore -> ${dataFiles()}")
    assert(spark.read.parquet(tbl).count() == before)
    // vacuum removed the crash debris
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(tbl, ".staging-dead-run")))
    // both outcomes + their stats summaries are in the job-history ledger
    val hist = ledger.history.collect()
      .map(r => r.getAs[String]("job") -> r.getAs[String]("detail")).toMap
    assert(hist("compact").contains("compact-files:"), hist.toString)
    assert(hist("sweep").contains("vacuum: removed=1"), hist.toString)
    // an unknown maintenance kind is rejected at parse time
    val e = intercept[IllegalArgumentException] {
      FlowDag.fromProperties(Map("job.1.job.name" -> "x",
        "job.1.job.type" -> "defragment"))
    }
    assert(e.getMessage.contains("not a maintenance kind"))
  }

  test("ann-index-maintain hop: low drift folds batches, high drift rebuilds") {
    import org.apache.spark.sql.functions._
    import graft.ann.Ann
    val dir = tmpDir("flowdag-annmaint")
    val idx = s"$dir/index"
    val derived = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    Ann.ivfInitIndex(derived.filter(col("vec_id") < 200), "vec_id", "v", m, idx)
    Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 200 && col("vec_id") < 350),
      "vec_id", "v", idx, batchId = 0L)
    Ann.ivfAppendIndex(derived.filter(col("vec_id") >= 350), "vec_id", "v",
      idx, batchId = 1L)
    // drift probes: one drawn from the trained distribution, one confined
    // to 2 of the 16 classes (the AnnSpec appendDrift fixtures)
    derived.filter(col("vec_id") % 7 === 0).write.parquet(s"$dir/batch-low")
    derived.filter(pmod(col("vec_id"), lit(16L)) < 2)
      .write.parquet(s"$dir/batch-high")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // LOW drift: no rebuild — committed batches fold (newest stays out)
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val low = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "ann-nightly",
      "job.1.job.name" -> "maintain",
      "job.1.job.type" -> "ann-index-maintain",
      "job.1.index.path" -> idx,
      "job.1.batch.path" -> s"$dir/batch-low",
      "job.1.id.col" -> "vec_id",
      "job.1.vec.col" -> "v")), "annlow", ledger = Some(ledger))
    assert(low("maintain").status == FlowDag.Succeeded)
    val lowDetail = ledger.history.collect()
      .map(_.getAs[String]("detail")).find(_.contains("ann-index-maintain"))
    assert(lowDetail.exists(_.contains("compacted")), lowDetail.toString)
    val batchesAfterLow = spark.read.parquet(idx).select("batch").distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq
    assert(batchesAfterLow == Seq(0L, 1L), batchesAfterLow.toString)
    assert(spark.read.parquet(idx).count() == 500)

    // HIGH drift: quantizer retrained, index rebuilt + swapped atomically
    val high = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "ann-nightly",
      "job.1.job.name" -> "maintain",
      "job.1.job.type" -> "ann-index-maintain",
      "job.1.index.path" -> idx,
      "job.1.batch.path" -> s"$dir/batch-high",
      "job.1.id.col" -> "vec_id",
      "job.1.vec.col" -> "v",
      "job.1.rebuild.cells" -> "8")), "annhigh")
    assert(high("maintain").status == FlowDag.Succeeded,
      high("maintain").toString)
    // rebuilt: one batch kept under the old max id, 8-cell model, all rows
    assert(spark.read.parquet(idx).select("batch").distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(1L))
    assert(spark.read.parquet(idx).count() == 500)
    assert(Ann.loadModel(spark, idx).numCells == 8)
    // the fold line covers everything the rebuild consumed: replays no-op
    Ann.ivfAppendIndex(derived.filter(col("vec_id") < 200), "vec_id", "v",
      idx, batchId = 0L)
    assert(spark.read.parquet(idx).count() == 500)
    // no swap debris
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ".old-index")))
    // the rebuilt index still searches end-to-end
    val got = Ann.ivfTopKIndexed(idx, derived.filter(col("vec_id") < 3),
      "vec_id", "v", k = 5, nprobe = 2, Ann.loadModel(spark, idx))
    assert(got.count() == 15)
  }

  test("ann-index-maintain on a PQ index: high drift rebuilds from the source corpus") {
    import org.apache.spark.sql.functions._
    import graft.ann.{Ann, IvfPq}
    val dir = tmpDir("flowdag-annpq")
    val idx = s"$dir/index"
    val derived = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i.cast("bigint") === pmod(col("vec_id"), lit(16L)),
            lit(10.0)).otherwise(lit(0.0))).as("v"))
    val m = Ann.ivfTrain(derived, "vec_id", "v", numCells = 16)
    val cb = IvfPq.trainResiduals(derived, "vec_id", "v", m, m = 8, k = 16)
    Ann.ivfInitIndexPq(derived, "vec_id", "v", m, cb, idx)
    derived.write.parquet(s"$dir/source")
    derived.filter(pmod(col("vec_id"), lit(16L)) < 2)
      .write.parquet(s"$dir/batch-high")
    val res = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "ann-pq-nightly",
      "job.1.job.name" -> "maintain",
      "job.1.job.type" -> "ann-index-maintain",
      "job.1.index.path" -> idx,
      "job.1.batch.path" -> s"$dir/batch-high",
      "job.1.id.col" -> "vec_id",
      "job.1.vec.col" -> "v",
      "job.1.rebuild.source.path" -> s"$dir/source",
      "job.1.rebuild.cells" -> "8",
      "job.1.pq.k" -> "16")), "annpq")
    assert(res("maintain").status == FlowDag.Succeeded,
      res("maintain").toString)
    // codec sniffed from _codebooks.json: rebuilt index is still PQ
    val rows = spark.read.parquet(idx)
    assert(rows.count() == 500 && rows.columns.contains("pq_code"))
    assert(Ann.loadModel(spark, idx).numCells == 8)
    assert(Ann.ivfTopKIndexedPq(idx, derived.filter(col("vec_id") < 3),
      "vec_id", "v", k = 5, nprobe = 2).count() == 15)
  }

  test("media-dedup-ingest hop: a flow node drains a dump into the dedup store") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("flowdag-mediadedup")
    val docs = graft.Tables.load(spark, sf, "documents")
    val variants = graft.multimodal.Multimodal
      .syntheticImageVariants(spark, docs, groups = 25)
      .filter(expr("(media_id div 25) % 2 = 0"))
    variants.filter(col("media_id") < 200).coalesce(1)
      .write.parquet(s"$dir/in/f0")
    variants.filter(col("media_id") >= 200).coalesce(1)
      .write.parquet(s"$dir/in/f1")
    new java.io.File(s"$dir/in/f0").listFiles()
      .foreach(_.setLastModified(1000000L))
    new java.io.File(s"$dir/in/f1").listFiles()
      .foreach(_.setLastModified(2000000L))
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val res = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "crawl-admit",
      "job.1.job.name" -> "admit",
      "job.1.job.type" -> "media-dedup-ingest",
      "job.1.input.glob" -> s"$dir/in/*",
      "job.1.store.path" -> s"$dir/store",
      "job.1.checkpoint.dir" -> s"$dir/ckpt",
      "job.1.modality" -> "image")), "mediaflow", ledger = Some(ledger))
    assert(res("admit").status == FlowDag.Succeeded)
    val got = graft.streaming.MediaDedupIngest.survivors(spark, s"$dir/store")
    // 25 base contents, first seen in batch 0 at their min ids 0..24
    assert(got.select("media_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == (0L until 25L))
    val detail = ledger.history.collect()
      .map(_.getAs[String]("detail")).find(_.contains("media-dedup-ingest"))
    assert(detail.exists(_.contains("survivors=25")), detail.toString)
    // a re-run of the same flow (same checkpoint) is a no-op, not a wipe
    val again = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "crawl-admit",
      "job.1.job.name" -> "admit",
      "job.1.job.type" -> "media-dedup-ingest",
      "job.1.input.glob" -> s"$dir/in/*",
      "job.1.store.path" -> s"$dir/store",
      "job.1.checkpoint.dir" -> s"$dir/ckpt",
      "job.1.modality" -> "image")), "mediaflow2", ledger = Some(ledger))
    assert(again("admit").status == FlowDag.Succeeded)
    assert(graft.streaming.MediaDedupIngest.survivors(spark, s"$dir/store")
      .count() == 25)
  }

  test("media-dedup-ingest hop: quality.gate rejects defects before admission") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("flowdag-mediadedup-gate")
    val docs = graft.Tables.load(spark, sf, "documents")
    val clean = graft.multimodal.Multimodal
      .syntheticImageVariants(spark, docs.filter(col("doc_id") % 5 =!= 0),
        groups = 20)
      .filter(expr("(media_id div 20) % 2 = 0"))
    val defects = graft.multimodal.Multimodal
      .syntheticImageQualityMix(spark, docs.filter(col("doc_id") % 5 === 0))
    clean.unionByName(defects).coalesce(1).write.parquet(s"$dir/in/f0")
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val res = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "crawl-admit-gated",
      "job.1.job.name" -> "admit",
      "job.1.job.type" -> "media-dedup-ingest",
      "job.1.input.glob" -> s"$dir/in/*",
      "job.1.store.path" -> s"$dir/store",
      "job.1.checkpoint.dir" -> s"$dir/ckpt",
      "job.1.modality" -> "image",
      "job.1.quality.gate" -> "true")), "mediaflow-gated",
      ledger = Some(ledger))
    assert(res("admit").status == FlowDag.Succeeded)
    // thumbnails gate; clean renders admit first-seen per group
    val got = graft.streaming.MediaDedupIngest.survivors(spark, s"$dir/store")
    assert(got.select("media_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == (0L until 20L).filter(_ % 5 != 0))
    val nGated = docs.filter(col("doc_id") % 5 === 0).count()
    val detail = ledger.history.collect()
      .map(_.getAs[String]("detail")).find(_.contains("media-dedup-ingest"))
    assert(detail.exists(_.contains(s"gated=$nGated")), detail.toString)
  }

  test("media-dedup-ingest hop: part.hashes refuses trimmed re-uploads at admission") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("flowdag-mediadedup-parts")
    val docs = graft.Tables.load(spark, sf, "documents")
    val clips = graft.multimodal.Multimodal
      .syntheticAudioShiftVariants(spark, docs, groups = 10)
      .filter(col("media_id") < 20) // bases 0..9, trimmed copies 10..19
    clips.filter(col("media_id") < 10).coalesce(1)
      .write.parquet(s"$dir/in/f0")
    clips.filter(col("media_id") >= 10).coalesce(1)
      .write.parquet(s"$dir/in/f1")
    new java.io.File(s"$dir/in/f0").listFiles()
      .foreach(_.setLastModified(1000000L))
    new java.io.File(s"$dir/in/f1").listFiles()
      .foreach(_.setLastModified(2000000L))
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val res = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "crawl-admit-parts",
      "job.1.job.name" -> "admit",
      "job.1.job.type" -> "media-dedup-ingest",
      "job.1.input.glob" -> s"$dir/in/*",
      "job.1.store.path" -> s"$dir/store",
      "job.1.checkpoint.dir" -> s"$dir/ckpt",
      "job.1.modality" -> "audio",
      "job.1.part.hashes" -> "true",
      "job.1.min.shared.parts" -> "2")), "mediaflow-parts",
      ledger = Some(ledger))
    assert(res("admit").status == FlowDag.Succeeded)
    // the trimmed re-uploads carry fresh whole-clip fingerprints but
    // >= 2 of their hop-aligned window values are committed — refused
    assert(graft.streaming.MediaDedupIngest.survivors(spark, s"$dir/store")
      .select("media_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == (0L until 10L))
  }

  test("media-dedup-ingest hop: an IDLE run (empty backlog) reports survivors=0") {
    // empty input glob -> AvailableNow runs no batch -> the survivors
    // dir is never created; the node must report 0, not crash
    val dir = tmpDir("flowdag-mediadedup-idle")
    new java.io.File(s"$dir/in").mkdirs()
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val res = FlowDag.run(spark, FlowDag.fromProperties(Map(
      "flow.name" -> "crawl-admit-idle",
      "job.1.job.name" -> "admit",
      "job.1.job.type" -> "media-dedup-ingest",
      "job.1.input.glob" -> s"$dir/in/*",
      "job.1.store.path" -> s"$dir/store",
      "job.1.checkpoint.dir" -> s"$dir/ckpt",
      "job.1.modality" -> "image")), "mediaflow-idle", ledger = Some(ledger))
    assert(res("admit").status == FlowDag.Succeeded)
    assert(graft.streaming.MediaDedupIngest.survivors(spark, s"$dir/store")
      .count() == 0)
    val detail = ledger.history.collect()
      .map(_.getAs[String]("detail")).find(_.contains("media-dedup-ingest"))
    assert(detail.exists(_.contains("survivors=0")), detail.toString)
  }

  test("a failed node cancels descendants but independent branches run") {
    val dir = tmpDir("flowdag-fail")
    val bad = FlowDag.FlowNode(
      leafSpec("bad", s"$dir/does-not-exist", s"$dir/bad-out"))
    val child = FlowDag.FlowNode(
      leafSpec("child", s"$dir/bad-out", s"$dir/child-out"),
      dependsOn = Seq("bad"))
    val grandchild = FlowDag.FlowNode(
      leafSpec("grandchild", s"$dir/child-out", s"$dir/gc-out"),
      dependsOn = Seq("child"))
    val indep = FlowDag.FlowNode(
      leafSpec("indep", s"$sf/nation.parquet", s"$dir/indep-out"))
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val res = FlowDag.run(spark, Seq(bad, child, grandchild, indep),
      "flowrun2", ledger = Some(ledger))
    assert(res("bad").status == FlowDag.Failed)
    assert(res("child").status == FlowDag.Cancelled)
    assert(res("grandchild").status == FlowDag.Cancelled)
    assert(res("indep").status == FlowDag.Succeeded)
    assert(spark.read.parquet(s"$dir/indep-out").count() > 0)
    // every node outcome is in the job-history ledger
    val hist = ledger.history.collect()
      .map(r => r.getAs[String]("job") -> r.getAs[String]("status")).toMap
    assert(hist == Map("bad" -> "FAILED", "child" -> "CANCELLED",
      "grandchild" -> "CANCELLED", "indep" -> "SUCCEEDED"))
    assert(ledger.history.filter("job = 'bad'").head()
      .getAs[String]("detail").nonEmpty)
  }

  test("scheduled flow: hive-copy hop then a validation hop reading the replica via the target catalog") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("flowdag-hcp")
    spark.sql("CREATE DATABASE IF NOT EXISTS fdh_src")
    spark.sql("CREATE DATABASE IF NOT EXISTS fdh_tgt")
    // a dt-partitioned source table registered in the source "metastore"
    val srcLoc = s"$dir/src/ev_flow"
    val src = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"))
    src.repartition(col("dt")).write.partitionBy("dt").parquet(srcLoc)
    spark.sql("DROP TABLE IF EXISTS fdh_src.ev_flow")
    graft.operators.HiveCopy.registerExternal(spark, "fdh_src", "ev_flow",
      src.schema, Seq("dt"), srcLoc, recoverPartitions = true)
    val srcCount = spark.table("fdh_src.ev_flow").count()

    // the reference runs Hive replication as a scheduler-owned job
    // config; here: a stored flow whose first hop is the hive-copy and
    // whose second hop VALIDATES the replica by reading it back through
    // the TARGET catalog (source.format=table) under a FAIL row policy
    val store = new FlowService.FlowConfigStore(spark, s"$dir/catalog")
    store.put(FlowService.FlowConfig("hive-repl", Map(
      "job.1.job.name" -> "replicate",
      "job.1.job.type" -> "hive-copy",
      "job.1.whitelist" -> "fdh_src.ev_flow",
      "job.1.target.db" -> "fdh_tgt",
      "job.1.target.root" -> s"$dir/tgt",
      "job.1.existing.policy" -> "UPDATE_TABLE",
      "job.2.job.name" -> "validate",
      "job.2.dependsOn" -> "replicate",
      "job.2.source.format" -> "table",
      "job.2.source.path" -> "fdh_tgt.ev_flow",
      "job.2.rowpolicy.1.name" -> "partitionKeyPresent",
      "job.2.rowpolicy.1.predicate" -> "dt IS NOT NULL",
      "job.2.rowpolicy.1.type" -> "FAIL",
      "job.2.fork.1.out" -> s"$dir/validated"),
      schedule = Some("every:3600")))
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val sched = new FlowService.FlowScheduler(spark, store, ledger)
    assert(sched.tick(1700000000000L) == Seq("hive-repl"))

    // replica registered + partitioned in the target catalog
    val srcParts = spark.sql("SHOW PARTITIONS fdh_src.ev_flow").count()
    assert(spark.sql("SHOW PARTITIONS fdh_tgt.ev_flow").count() == srcParts)
    assert(spark.table("fdh_tgt.ev_flow").count() == srcCount)
    // the validation hop consumed the replica THROUGH the catalog and
    // published every row (the FAIL policy held)
    assert(spark.read.parquet(s"$dir/validated").count() == srcCount)
    val hist = ledger.history.collect()
      .map(r => r.getAs[String]("job") ->
        (r.getAs[String]("status"), r.getAs[String]("detail"))).toMap
    assert(hist("replicate")._1 == "SUCCEEDED", hist)
    assert(hist("replicate")._2.contains("hive-copy: tables=1"), hist)
    assert(hist("validate")._1 == "SUCCEEDED", hist)

    // second tick inside the hour: nothing due; forced re-execute is an
    // incremental no-op copy (zero files moved, replica still green)
    assert(sched.tick(1700000000000L + 60000).isEmpty)
    val res2 = FlowService.execute(spark, store, ledger, "hive-repl", "run2")
    assert(res2("replicate").status == FlowDag.Succeeded)
    assert(res2("replicate").detail.exists(_.contains("copied=0")), res2)

    // a schema spec alongside source.format=table refuses at read time
    val e = intercept[Exception] {
      PipelineRunner.run(spark, PipelineSpec(name = "bad-table-src",
        source = SourceSpec(format = "table", path = "fdh_tgt.ev_flow",
          schemaDDL = Some("event_id BIGINT")),
        branches = Seq(BranchSpec(name = "main", outDir = s"$dir/never"))),
        "run3")
    }
    assert(e.getMessage.contains("catalog's schema"), e.getMessage)
  }

  test("value-audit hops: two phases audited, the diff hop gates the flow") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("flowdag-va")
    val src = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.write.parquet(s"$dir/pull")
    // the published phase silently lost a row and corrupted another
    src.filter(col("o_orderkey") =!= 7L)
      .withColumn("o_totalprice", when(col("o_orderkey") === 32L,
        col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      .write.parquet(s"$dir/pub")
    def auditProps(i: Int, name: String, path: String, phase: String) = Map(
      s"job.$i.job.name" -> name, s"job.$i.job.type" -> "value-audit",
      s"job.$i.path" -> path, s"job.$i.db" -> "tpch",
      s"job.$i.table" -> "orders", s"job.$i.out.root" -> s"$dir/audits",
      s"job.$i.key.fields" -> "o_orderkey",
      s"job.$i.delta.fields" -> "o_orderstatus,o_totalprice",
      s"job.$i.projection" -> "KEY_DELTA",
      s"job.$i.phase" -> phase, s"job.$i.snapshot" -> "s9")
    val auditDir = (phase: String) =>
      s"$dir/audits/tpch/orders/P=${phase}_C=NA_E=NA_S=s9_D=NA"
    val ledger = new graft.state.RunLedger(spark, s"$dir/ledger")
    val nodes = FlowDag.fromProperties(
      auditProps(1, "audit-pull", s"$dir/pull", "PULL") ++
      auditProps(2, "audit-pub", s"$dir/pub", "SS_PUB") ++ Map(
        "job.3.job.name" -> "gate", "job.3.job.type" -> "value-audit-diff",
        "job.3.dependsOn" -> "audit-pull,audit-pub",
        "job.3.dir.a" -> auditDir("PULL"), "job.3.dir.b" -> auditDir("SS_PUB"),
        "job.3.keys" -> "o_orderkey", "job.3.out" -> s"$dir/diff",
        "job.4.job.name" -> "downstream", "job.4.dependsOn" -> "gate",
        "job.4.source.path" -> s"$dir/pub",
        "job.4.fork.1.out" -> s"$dir/published"))
    val res = FlowDag.run(spark, nodes, "va-run", ledger = Some(ledger))
    assert(res("audit-pull").status == FlowDag.Succeeded)
    assert(res("audit-pub").status == FlowDag.Succeeded)
    // the gate FAILED the flow: phases diverged, descendants cancelled
    assert(res("gate").status == FlowDag.Failed)
    assert(res("gate").error.exists(_.contains("diverged")), res("gate"))
    assert(res("downstream").status == FlowDag.Cancelled)
    // the persisted diff carries the planted divergence exactly
    val d = spark.read.parquet(s"$dir/diff").collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("mismatches"), r.getAs[Long]("only_in_a"),
          r.getAs[Long]("only_in_b"))).toMap
    assert(d("o_totalprice") == ((1L, 1L, 0L)), d)
    assert(d("o_orderstatus") == ((0L, 1L, 0L)), d)

    // identical phases: the gate passes and downstream publishes
    val nodes2 = FlowDag.fromProperties(
      auditProps(1, "audit-pull2", s"$dir/pull", "AVRO_CONV") ++
      auditProps(2, "audit-pub2", s"$dir/pull", "SS_MAT") ++ Map(
        "job.3.job.name" -> "gate2", "job.3.job.type" -> "value-audit-diff",
        "job.3.dependsOn" -> "audit-pull2,audit-pub2",
        "job.3.dir.a" -> auditDir("AVRO_CONV"),
        "job.3.dir.b" -> auditDir("SS_MAT"),
        "job.3.keys" -> "o_orderkey",
        "job.4.job.name" -> "downstream2", "job.4.dependsOn" -> "gate2",
        "job.4.source.path" -> s"$dir/pull",
        "job.4.fork.1.out" -> s"$dir/published2"))
    val res2 = FlowDag.run(spark, nodes2, "va-run2")
    assert(res2.values.forall(_.status == FlowDag.Succeeded), res2)
    assert(res2("gate2").detail.exists(_.contains("mismatches=0")), res2)
    assert(spark.read.parquet(s"$dir/published2").count() == src.count())
  }
}
