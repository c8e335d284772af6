package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.HiveCopy.{Config, DeregisterDelete, ExistingTablePolicy}

/** Hive-table-aware copy (HiveCopyEntityHelper.java:98): discovery,
  * partition-filtered planning, incremental file sync, target-metastore
  * registration / deregistration — all proven THROUGH the embedded-derby
  * metastore the shared test session runs on. */
class HiveCopySpec extends SparkSpec {

  private val srcDb = "hcp_src"
  private val tgtDb = "hcp_tgt"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $srcDb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $tgtDb")
  }

  private def eventsByDt = Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("value"),
      date_format(col("ts"), "yyyy-MM-dd").as("dt"))

  /** Partitioned source table registered in the source "metastore". */
  private def makeSource(table: String): (String, Seq[String]) = {
    val loc = tmpDir(s"hcp-$table") + s"/$table"
    eventsByDt.repartition(col("dt")).write.partitionBy("dt").parquet(loc)
    spark.sql(s"DROP TABLE IF EXISTS $srcDb.$table")
    HiveCopy.registerExternal(spark, srcDb, table, eventsByDt.schema,
      Seq("dt"), loc, recoverPartitions = true)
    val dts = spark.sql(s"SHOW PARTITIONS $srcDb.$table").collect()
      .map(_.getString(0).stripPrefix("dt=")).sorted.toSeq
    (loc, dts)
  }

  test("full copy: replica registered and readable through the target metastore") {
    val (_, dts) = makeSource("ev_full")
    assert(dts.size > 1, s"need multiple partitions, got $dts")
    val root = tmpDir("hcp-full-tgt")
    val r = HiveCopy.copyTable(spark, s"$srcDb.ev_full",
      Config(targetDb = tgtDb, targetRoot = root))
    assert(r.filesCopied > 0 && r.partitionsRegistered == dts.size, r)
    assert(r.partitions.forall(_.action == "copied"), r.partitions)
    // the replica is visible via the TARGET metastore, partitions and all
    val parts = spark.sql(s"SHOW PARTITIONS $tgtDb.ev_full").collect()
    assert(parts.length == dts.size)
    assert(spark.table(s"$tgtDb.ev_full").count() ==
      spark.table(s"$srcDb.ev_full").count())
    // content equality, not just counts
    assert(spark.table(s"$tgtDb.ev_full")
      .except(spark.table(s"$srcDb.ev_full")).isEmpty)
  }

  test("partition filter restricts the copy to the metastore-filtered set") {
    val (_, dts) = makeSource("ev_filt")
    val cut = dts(dts.size / 2)
    val root = tmpDir("hcp-filt-tgt")
    val r = HiveCopy.copyTable(spark, s"$srcDb.ev_filt",
      Config(tgtDb, root, partitionFilter = Some(s"dt >= '$cut'")))
    val expected = dts.filter(_ >= cut)
    assert(r.partitions.map(_.spec("dt")).sorted == expected, r.partitions)
    val parts = spark.sql(s"SHOW PARTITIONS $tgtDb.ev_filt").collect()
      .map(_.getString(0).stripPrefix("dt=")).sorted.toSeq
    assert(parts == expected)
    assert(spark.table(s"$tgtDb.ev_filt").count() ==
      spark.table(s"$srcDb.ev_filt").where(col("dt") >= cut).count())
    // a filter over a non-partition column refuses at plan time
    val e = intercept[IllegalArgumentException] {
      HiveCopy.copyTable(spark, s"$srcDb.ev_filt",
        Config(tgtDb, root, partitionFilter = Some("event_id > 5"),
          existingPolicy = ExistingTablePolicy.Update))
    }
    assert(e.getMessage.contains("not a partition column"), e.getMessage)
  }

  test("incremental run copies only the changed partition; unchanged are in-sync") {
    val (srcLoc, dts) = makeSource("ev_incr")
    val root = tmpDir("hcp-incr-tgt")
    val cfg = Config(tgtDb, root,
      existingPolicy = ExistingTablePolicy.Update)
    val r1 = HiveCopy.copyTable(spark, s"$srcDb.ev_incr", cfg)
    assert(r1.filesCopied > 0)

    // second run with nothing changed: zero copies, all in-sync
    val r2 = HiveCopy.copyTable(spark, s"$srcDb.ev_incr", cfg)
    assert(r2.filesCopied == 0 && r2.filesDeleted == 0,
      s"no-op run still copied: $r2")
    assert(r2.partitions.forall(_.action == "in-sync"))

    // a NEW source partition appears -> only it is copied + registered
    val newDt = "2099-12-31"
    eventsByDt.where(col("event_id") % 101 === 0).drop("dt")
      .write.parquet(s"$srcLoc/dt=$newDt")
    spark.sql(s"ALTER TABLE $srcDb.ev_incr RECOVER PARTITIONS")
    val r3 = HiveCopy.copyTable(spark, s"$srcDb.ev_incr", cfg)
    val touched = r3.partitions.filter(_.action == "copied")
    assert(touched.map(_.spec("dt")) == Seq(newDt), r3.partitions)
    assert(r3.partitionsRegistered == 1)
    assert(spark.sql(s"SHOW PARTITIONS $tgtDb.ev_incr").count() == dts.size + 1)
    assert(spark.table(s"$tgtDb.ev_incr").count() ==
      spark.table(s"$srcDb.ev_incr").count())

    // a REWRITTEN partition (same rows, new files) re-syncs exactly it:
    // new files copied, the stale target files deleted
    val firstDt = dts.head
    val rows = spark.table(s"$srcDb.ev_incr").where(col("dt") === firstDt)
      .drop("dt").cache()
    val n = rows.count()
    rows.coalesce(1).write.mode("overwrite").parquet(s"$srcLoc/dt=$firstDt")
    rows.unpersist()
    val r4 = HiveCopy.copyTable(spark, s"$srcDb.ev_incr", cfg)
    val changed = r4.partitions.filter(_.action == "copied")
    assert(changed.map(_.spec("dt")) == Seq(firstDt), r4.partitions)
    assert(changed.head.filesDeleted > 0, "stale target files not deleted")
    assert(spark.table(s"$tgtDb.ev_incr").where(col("dt") === firstDt)
      .count() == n)

    // the replica registration carries the partition scheme: a dt
    // filter through the TARGET catalog prunes at the scan (a DDL
    // missing PARTITIONED BY would silently full-scan every read)
    val pruned = spark.table(s"$tgtDb.ev_incr")
      .where(col("dt") === firstDt)
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(pruned.contains("PartitionFilters") && pruned.contains("dt"),
      s"replica reads must partition-prune on dt:\n${pruned.take(500)}")
  }

  test("partition dropped at source is deregistered at target (files per policy)") {
    val (srcLoc, dts) = makeSource("ev_dereg")
    val root = tmpDir("hcp-dereg-tgt")
    val cfg = Config(tgtDb, root,
      existingPolicy = ExistingTablePolicy.Update,
      deregisterDelete = DeregisterDelete.Recursive)
    HiveCopy.copyTable(spark, s"$srcDb.ev_dereg", cfg)

    val gone = dts.head
    spark.sql(s"ALTER TABLE $srcDb.ev_dereg DROP IF EXISTS PARTITION (dt='$gone')")
    val fs = new org.apache.hadoop.fs.Path(srcLoc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$srcLoc/dt=$gone"), true)

    val r = HiveCopy.copyTable(spark, s"$srcDb.ev_dereg", cfg)
    assert(r.partitionsDeregistered == 1, r)
    assert(r.partitions.count(_.action == "deregistered") == 1)
    val parts = spark.sql(s"SHOW PARTITIONS $tgtDb.ev_dereg").collect()
      .map(_.getString(0).stripPrefix("dt=")).sorted.toSeq
    assert(parts == dts.tail, parts)
    // Recursive: the deregistered partition's files are gone too
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/$tgtDb/ev_dereg/dt=$gone")))
  }

  test("existing-entity policies: Abort refuses mismatch, Replace re-registers") {
    makeSource("ev_pol")
    val rootA = tmpDir("hcp-pol-a")
    val rootB = tmpDir("hcp-pol-b")
    HiveCopy.copyTable(spark, s"$srcDb.ev_pol", Config(tgtDb, rootA))
    // same target table, DIFFERENT root: Abort refuses
    val e = intercept[IllegalArgumentException] {
      HiveCopy.copyTable(spark, s"$srcDb.ev_pol", Config(tgtDb, rootB))
    }
    assert(e.getMessage.contains("ABORT refuses"), e.getMessage)
    // Replace re-points the registration at the new root
    val r = HiveCopy.copyTable(spark, s"$srcDb.ev_pol",
      Config(tgtDb, rootB, existingPolicy = ExistingTablePolicy.Replace))
    assert(r.targetLocation.startsWith(rootB))
    assert(spark.table(s"$tgtDb.ev_pol").count() ==
      spark.table(s"$srcDb.ev_pol").count())
    // copying a table onto its own location refuses loudly
    val self = intercept[IllegalArgumentException] {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("ev_pol", Some(srcDb)))
      val parent = new org.apache.hadoop.fs.Path(meta.location).getParent
        .getParent.toString
      HiveCopy.copyTable(spark, s"$srcDb.ev_pol",
        Config(srcDb, parent, existingPolicy = ExistingTablePolicy.Update))
    }
    assert(self.getMessage.contains("onto itself"), self.getMessage)
  }

  test("Replace onto the live replica's own root swaps to a versioned root") {
    makeSource("ev_ver")
    val root = tmpDir("hcp-ver-tgt")
    HiveCopy.copyTable(spark, s"$srcDb.ev_ver", Config(tgtDb, root))
    val loc0 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("ev_ver", Some(tgtDb)))
      .location.toString
    val fs = new org.apache.hadoop.fs.Path(loc0)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // re-replicating with Replace must NOT rewrite files under the
    // still-registered root: it lands in a __v1 sibling and swaps
    val r1 = HiveCopy.copyTable(spark, s"$srcDb.ev_ver",
      Config(tgtDb, root, existingPolicy = ExistingTablePolicy.Replace))
    assert(r1.targetLocation.endsWith("__v1"), r1.targetLocation)
    // old root is left on disk for retention cleanup (in-flight readers)
    assert(fs.exists(new org.apache.hadoop.fs.Path(loc0)))
    assert(spark.table(s"$tgtDb.ev_ver").count() ==
      spark.table(s"$srcDb.ev_ver").count())

    // a further Replace versions again: __v1 -> __v2, never __v1__v1
    val r2 = HiveCopy.copyTable(spark, s"$srcDb.ev_ver",
      Config(tgtDb, root, existingPolicy = ExistingTablePolicy.Replace))
    assert(r2.targetLocation.endsWith("__v2"), r2.targetLocation)
    assert(spark.table(s"$tgtDb.ev_ver").count() ==
      spark.table(s"$srcDb.ev_ver").count())
  }

  test("unpartitioned table copies as a single file set") {
    val loc = tmpDir("hcp-unpart") + "/nation"
    Tables.load(spark, sf, "nation").write.parquet(loc)
    spark.sql(s"DROP TABLE IF EXISTS $srcDb.nation_u")
    HiveCopy.registerExternal(spark, srcDb, "nation_u",
      Tables.load(spark, sf, "nation").schema, Nil, loc)
    val r = HiveCopy.copyTable(spark, s"$srcDb.nation_u",
      Config(tgtDb, tmpDir("hcp-unpart-tgt")))
    assert(r.filesCopied > 0 && r.partitions.map(_.action) == Seq("table"))
    assert(spark.table(s"$tgtDb.nation_u").count() ==
      spark.table(s"$srcDb.nation_u").count())
    // filter on an unpartitioned table refuses
    intercept[IllegalArgumentException] {
      HiveCopy.copyTable(spark, s"$srcDb.nation_u",
        Config(tgtDb, tmpDir("x"), partitionFilter = Some("dt > '0'"),
          existingPolicy = ExistingTablePolicy.Update))
    }: Unit
  }

  test("discovery: whitelist/blacklist db.table glob patterns") {
    spark.sql("CREATE DATABASE IF NOT EXISTS hcp_disc_a")
    spark.sql("CREATE DATABASE IF NOT EXISTS hcp_disc_b")
    import spark.implicits._
    // session temp views are NOT discoverable datasets: this one's name
    // matches every whitelist below, and other suites sharing the session
    // leave their own temp views around — none may leak into discovery
    Seq(1).toDF("x").createOrReplaceTempView("t_tempview_not_a_table")
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable("hcp_disc_a.t_one")
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable("hcp_disc_a.t_two")
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable("hcp_disc_a.other")
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable("hcp_disc_b.t_one")
    def names(ws: Seq[String], bs: Seq[String] = Nil) = {
      val ids = HiveCopy.discover(spark, ws, bs)
      // every discovered identifier is db-qualified (a temp view is not)
      assert(ids.forall(_.database.isDefined), ids)
      assert(!ids.exists(_.table.contains("tempview")), ids)
      ids.map(t => s"${t.database.get}.${t.table}").sorted
    }
    // whole-db whitelist
    assert(names(Seq("hcp_disc_a")) ==
      Seq("hcp_disc_a.other", "hcp_disc_a.t_one", "hcp_disc_a.t_two"))
    // table glob
    assert(names(Seq("hcp_disc_a.t_*")) ==
      Seq("hcp_disc_a.t_one", "hcp_disc_a.t_two"))
    // '|' table alternatives + db glob
    assert(names(Seq("hcp_disc_*.t_one|other")) ==
      Seq("hcp_disc_a.other", "hcp_disc_a.t_one", "hcp_disc_b.t_one"))
    // blacklist wins over whitelist
    assert(names(Seq("hcp_disc_a"), Seq("hcp_disc_a.t_two")) ==
      Seq("hcp_disc_a.other", "hcp_disc_a.t_one"))
    // whole-db blacklist
    assert(names(Seq("hcp_disc_*.t_one"), Seq("hcp_disc_b")) ==
      Seq("hcp_disc_a.t_one"))
  }

  test("a failed first copy leaves NO replica table registered (post-publish registration)") {
    makeSource("ev_crash")
    val root = tmpDir("hcp-crash-tgt")
    // sabotage: the table's would-be location is a plain FILE, so every
    // staging create fails and CopyExec throws mid-copy
    val tblPath = new org.apache.hadoop.fs.Path(s"$root/$tgtDb/ev_crash")
    val fs = tblPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tblPath, true); out.write(1); out.close()
    intercept[Exception] {
      HiveCopy.copyTable(spark, s"$srcDb.ev_crash", Config(tgtDb, root))
    }: Unit
    // the crash happened before registration: the target metastore has no
    // empty-but-readable ev_crash (reference registers post-publish)
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("ev_crash", Some(tgtDb))))
    // clean up the sabotage and re-run: the copy now succeeds end-to-end
    fs.delete(tblPath, false)
    val r = HiveCopy.copyTable(spark, s"$srcDb.ev_crash", Config(tgtDb, root))
    assert(r.filesCopied > 0)
    assert(spark.table(s"$tgtDb.ev_crash").count() ==
      spark.table(s"$srcDb.ev_crash").count())
  }
}
