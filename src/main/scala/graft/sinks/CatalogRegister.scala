package graft.sinks

import org.apache.spark.sql.SparkSession

/** Post-publish catalog registration: make published directories
  * SQL-visible tables and discover their partitions — the reference's
  * Hive-registration publisher
  * (gobblin-hive-registration/.../HiveRegister.java:62,
  * HiveRegistrationPublisher), whose job is CREATE TABLE IF NOT EXISTS +
  * ADD PARTITION per published path.
  *
  * Spark-first: `CREATE TABLE ... USING <format> LOCATION` against the
  * session catalog plus `ALTER TABLE ... RECOVER PARTITIONS` (MSCK) —
  * identical statements work against a real Hive metastore; the tests run
  * on the in-memory catalog.
  */
object CatalogRegister {

  /** Register (idempotently) a published directory as an external table
    * and sync its partitions. Returns the row count visible via SQL. */
  def register(spark: SparkSession, table: String, dir: String,
               format: String = "parquet",
               partitionCols: Seq[String] = Nil): Unit = {
    if (partitionCols.isEmpty)
      spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING $format " +
        s"LOCATION '$dir'"): Unit
    else {
      // partitioned external tables need an explicit column list; infer
      // it from the published files (partition columns come back from
      // Spark's layout discovery)
      val schema = spark.read.format(format).load(dir).schema
      val cols = schema.fields
        .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $table ($cols) USING $format " +
        s"PARTITIONED BY (${partitionCols.mkString(", ")}) " +
        s"LOCATION '$dir'"): Unit
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS"): Unit
    }
  }

  /** Drop the registration (data stays — external-table semantics). */
  def deregister(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table"): Unit

  /** Re-registration gate for a table whose published schema moved: the
    * new schema must be a valid evolution of the registered one
    * (HiveSchemaEvolution semantics — the reference refuses incompatible
    * re-registration rather than corrupting readers). Throws with every
    * incompatibility; on success the table is re-pointed via
    * deregister + register (external data untouched). If registering the
    * new location fails AFTER the drop, the previous registration is
    * restored before rethrowing — readers never see the table vanish
    * because of a failed re-point. */
  def reregisterEvolved(spark: SparkSession, table: String, dir: String,
                        format: String = "parquet",
                        partitionCols: Seq[String] = Nil): Unit = {
    val existing = spark.table(table).schema
    val incoming = spark.read.format(format).load(dir).schema
    val problems = graft.operators.SchemaEvolution
      .incompatibilities(existing, incoming)
    require(problems.isEmpty,
      s"refusing to re-register '$table': published schema is not a " +
        s"valid evolution:\n  ${problems.mkString("\n  ")}")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val oldDir = meta.location.toString
    val oldPartCols = meta.partitionColumnNames
    val oldFormat = meta.provider.getOrElse(format)
    deregister(spark, table)
    try register(spark, table, dir, format, partitionCols)
    catch {
      case e: Exception =>
        // register may have half-succeeded (CREATE ok, RECOVER failed), so
        // DROP before restoring — CREATE IF NOT EXISTS would otherwise
        // no-op and leave the table pointing at the broken new location.
        // Restore uses the table's ORIGINAL provider, not the new format.
        try {
          deregister(spark, table)
          register(spark, table, oldDir, oldFormat, oldPartCols)
        } catch { case restore: Exception => e.addSuppressed(restore) }
        throw e
    }
  }
}
