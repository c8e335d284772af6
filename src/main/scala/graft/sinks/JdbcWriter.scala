package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC sink with the reference's staging-table publish protocol.
  *
  * Reference: JdbcWriter batch-inserts into a STAGING table
  * (gobblin-modules/gobblin-sql/.../writer/JdbcWriter.java:67); at job
  * commit JdbcPublisher moves staging rows into the final table so a
  * mid-write failure never leaves partial rows visible. Batch size is the
  * dominant throughput knob (the reference's published sweep peaks at
  * batch=1000 — gobblin-docs/sinks/Gobblin-JDBC-Writer.md:188-196), so it
  * is first-class here and defaults to 1000.
  *
  * Spark-first: executors batch-insert partitions in parallel via
  * `df.write.jdbc` (the reference is single-writer; Spark's parallelism is
  * bounded by `numPartitions`); the publish step is one driver-side
  * INSERT..SELECT transaction, O(rows) in the database but zero data
  * movement through the engine.
  */
object JdbcWriter {

  final case class JdbcSpec(url: String,
                            table: String,
                            mode: SaveMode = SaveMode.Append,
                            batchSize: Int = 1000,
                            numPartitions: Option[Int] = None,
                            properties: Map[String, String] = Map.empty)

  /** Direct write (no staging): rows become visible as they commit per
    * partition — at-least-once on retry, like the reference without its
    * publisher. */
  def write(df: DataFrame, spec: JdbcSpec): Unit = {
    val p = new java.util.Properties()
    spec.properties.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("batchsize", spec.batchSize.toString)
    val d = spec.numPartitions.fold(df)(n => df.coalesce(n))
    d.write.mode(spec.mode).jdbc(spec.url, spec.table, p)
  }

  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    // scope the probe to the connection's current schema — a same-named
    // table in another schema must not suppress CREATE
    val schema = try conn.getSchema catch { case _: Throwable => null }
    val rs = conn.getMetaData.getTables(null, schema, null, Array("TABLE"))
    var found = false
    while (rs.next() && !found)
      found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
    rs.close(); found
  }

  /** A staging table written but not yet published. */
  final case class StagedTable(spec: JdbcSpec, staging: String)
      extends AtomicPublisher.StagedOutput {
    /** One transaction moves staging rows into the final table (created
      * from the staging shape when absent; DELETEd first for Overwrite),
      * then drops staging. */
    def promote(): Unit = promote(None)

    /** As [[promote()]], but also records `marker` = (stream, epoch) in
      * the commit ledger INSIDE the same transaction — the exactly-once
      * handshake of [[writeEpochOnce]]. */
    def promote(marker: Option[(String, Long)]): Unit = {
      val conn = DriverManager.getConnection(spec.url)
      try {
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        if (!tableExists(conn, spec.table))
          st.executeUpdate(
            s"CREATE TABLE ${spec.table} AS SELECT * FROM $staging WITH NO DATA")
        else if (spec.mode == SaveMode.Overwrite)
          st.executeUpdate(s"DELETE FROM ${spec.table}")
        st.executeUpdate(s"INSERT INTO ${spec.table} SELECT * FROM $staging")
        marker.foreach { case (stream, epoch) =>
          val ps = conn.prepareStatement(
            s"INSERT INTO $commitsTable VALUES (?, ?)")
          ps.setString(1, stream); ps.setLong(2, epoch)
          ps.executeUpdate(); ps.close()
        }
        conn.commit()
        st.executeUpdate(s"DROP TABLE $staging")
        conn.commit()
        st.close()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.close()
    }

    def abort(): Unit = {
      val conn = DriverManager.getConnection(spec.url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $staging")
        catch { case _: java.sql.SQLException => } // never written
        st.close()
      } finally conn.close()
    }
  }

  /** Parallel batch-insert into `<table>_stg_<runId>`; nothing visible
    * yet. The runId suffix keeps concurrent jobs (or a retry racing a
    * stuck run) from clobbering each other's staged rows — same reason
    * the file publisher embeds runId in its staging dir. */
  def stage(df: DataFrame, spec: JdbcSpec, runId: String = "run"): StagedTable = {
    val staging = spec.table + "_stg_" + runId.replaceAll("[^A-Za-z0-9_]", "_")
    val st = StagedTable(spec, staging)
    // mirror AtomicPublisher.stage: a write that dies mid-stage drops its
    // half-written staging table rather than leaving debris the caller
    // has no handle to abort
    try write(df, spec.copy(table = staging, mode = SaveMode.Overwrite))
    catch { case e: Throwable =>
      try st.abort() catch { case _: java.sql.SQLException => }
      throw e
    }
    st
  }

  /** Staged write + immediate publish. */
  def writeStaged(df: DataFrame, spec: JdbcSpec, runId: String = "run"): Unit =
    stage(df, spec, runId).promote()

  // ---- exactly-once per-epoch publish (streaming foreachBatch face) ----

  private val commitsTable = "graft_commits"

  private def ensureCommitsTable(url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      if (!tableExists(conn, commitsTable)) {
        val st = conn.createStatement()
        // the PRIMARY KEY is load-bearing: two drivers racing the same
        // epoch (zombie/failover overlap) both pass the fast-path check,
        // but only ONE ledger INSERT can commit — the loser's txn rolls
        // back atomically with its rows (see writeEpochOnce)
        try st.executeUpdate(s"CREATE TABLE $commitsTable " +
          "(stream VARCHAR(256) NOT NULL, epoch BIGINT NOT NULL, " +
          "PRIMARY KEY (stream, epoch))")
        catch { case _: java.sql.SQLException if tableExists(conn, commitsTable) =>
          // lost a concurrent CREATE race: the table exists, proceed
        }
        st.close()
      }
    } finally conn.close()
  }

  private def epochCommitted(url: String, stream: String, epoch: Long): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"SELECT count(*) FROM $commitsTable WHERE stream = ? AND epoch = ?")
      ps.setString(1, stream); ps.setLong(2, epoch)
      val rs = ps.executeQuery(); rs.next()
      val n = rs.getLong(1)
      rs.close(); ps.close()
      n > 0
    } finally conn.close()
  }

  /** Exactly-once micro-batch publish: the batch's rows and its
    * (stream, epoch) ledger entry commit in ONE transaction, so a restart
    * that re-delivers an unacknowledged epoch (checkpoint wrote the offset
    * but the sink ack was lost — Structured Streaming's at-least-once
    * foreachBatch contract) finds the ledger entry and skips the batch.
    * Returns false when the epoch was already committed. The ledger check
    * is only a fast path — the real guarantee is the ledger's PRIMARY KEY:
    * concurrent drivers racing one epoch both reach promote, but the
    * loser's duplicate ledger INSERT aborts its transaction, rows
    * included, before anything becomes visible.
    *
    * Reference: the streaming JDBC commit path — WriterUtils/JdbcPublisher
    * staging-table txn (JdbcWriter.java:67) + the watermark ack the
    * FineGrainedWatermarkTracker provides per flush epoch. */
  def writeEpochOnce(df: DataFrame, spec: JdbcSpec, stream: String,
                     epoch: Long): Boolean = {
    require(spec.mode == SaveMode.Append,
      "exactly-once epochs accumulate: use SaveMode.Append")
    ensureCommitsTable(spec.url)
    if (epochCommitted(spec.url, stream, epoch)) false
    else {
      val staged = stage(df, spec, s"${stream}_e$epoch")
      try { staged.promote(Some((stream, epoch))); true }
      catch {
        // SQLState 23xxx = integrity violation. Only a duplicate ledger
        // INSERT means "lost the race"; a constraint on the TARGET table
        // (a PK/NOT NULL someone added to the sink) raises the same class,
        // and swallowing it would advance the checkpoint past an epoch that
        // was never written. Trust the ledger, not the SQLState.
        case e: java.sql.SQLException
            if Option(e.getSQLState).exists(_.startsWith("23")) =>
          if (epochCommitted(spec.url, stream, epoch)) { staged.abort(); false }
          else { staged.abort(); throw e }
      }
    }
  }
}
