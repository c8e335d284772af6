package graft.sources

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.planning.WatermarkPartitioner
import graft.planning.WatermarkPartitioner.{Chunk, WatermarkType}

/** Incremental JDBC extraction: the previous run's high watermark bounds a
  * [low, high] interval, the interval splits into chunk predicates, and
  * each predicate becomes one partition of `spark.read.jdbc` — Spark sends
  * one `SELECT ... WHERE <chunk>` per partition, so the watermark filter
  * is evaluated in the database, never in the engine.
  *
  * Reference semantics: QueryBasedSource computes the interval from stored
  * state and splits it (gobblin-core/.../extract/QueryBasedSource.java:74,
  * 171,388), JdbcExtractor concatenates the watermark predicates into the
  * WHERE clause (gobblin-modules/gobblin-sql/.../jdbc/JdbcExtractor.java:
  * 1107) and fetches the max watermark with a dedicated query
  * (JdbcExtractor.java:776 getMaxWatermark).
  *
  * Identifiers inside predicates are double-quoted: Spark's JDBC writer
  * creates case-sensitive (quoted) column names, while unquoted names get
  * case-folded by the database — quoting keeps the predicate valid against
  * tables the engine itself wrote.
  *
  * Scale: partition count = chunk count; each executor opens one JDBC
  * cursor over an indexed watermark range — the same parallel-range plan
  * the reference generates, with Catalyst additionally pushing projection
  * and extra filters into each partition's query.
  *
  * Dialects: the reference ships five dialect-specific sources (Mysql/
  * Oracle/SqlServer/Postgresql/Teradata extractors under
  * gobblin-modules/gobblin-sql and .../extract/jdbc) whose differences are
  * schema discovery, limit syntax and type maps — all covered by Spark's
  * built-in JdbcDialects for the same five engines; tests run on embedded
  * Derby (the only database available offline).
  */
object JdbcIncremental {

  private def q(ident: String): String = "\"" + ident + "\""

  /** Chunk predicates for a numeric watermark column: (low, high]. */
  def numericPredicates(wmCol: String, low: Long, high: Long,
                        maxPartitions: Int): Array[String] =
    WatermarkPartitioner.splitNumeric(low, high, maxPartitions)
      .map(c => s"${q(wmCol)} > ${c.low} AND ${q(wmCol)} <= ${c.high}").toArray

  /** Chunk predicates for a time watermark column: (low, high].
    * `tsLiteral` renders a SQL timestamp literal — default is the
    * TIMESTAMP('yyyy-mm-dd hh:mm:ss') form Derby accepts; swap per
    * dialect. */
  def timePredicates(wmCol: String, low: Timestamp, high: Timestamp,
                     wmType: WatermarkType, maxPartitions: Int,
                     tsLiteral: Timestamp => String = derbyTs): Array[String] =
    WatermarkPartitioner.splitTime(low, high, wmType, maxPartitions)
      .map { c: Chunk[Timestamp] =>
        s"${q(wmCol)} > ${tsLiteral(c.low)} AND ${q(wmCol)} <= ${tsLiteral(c.high)}"
      }.toArray

  def derbyTs(t: Timestamp): String = {
    val s = t.toString // yyyy-mm-dd hh:mm:ss[.f...]
    s"TIMESTAMP('$s')"
  }

  /** One partition per predicate; the predicate is part of each
    * partition's WHERE clause (database-side evaluation). */
  def read(spark: SparkSession, url: String, table: String,
           predicates: Array[String],
           props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    if (predicates.isEmpty)
      spark.read.jdbc(url, table, p).limit(0) // empty interval -> empty extract
    else
      spark.read.jdbc(url, table, predicates, p)
  }

  /** Database-side max-watermark probe (JdbcExtractor.getMaxWatermark):
    * one-row aggregate query, no table scan shipped to the engine. */
  def maxWatermark(spark: SparkSession, url: String, table: String,
                   wmCol: String,
                   props: Map[String, String] = Map.empty): Option[Long] = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val sub = s"(SELECT MAX(${q(wmCol)}) AS wm_max FROM $table) mx"
    val row = spark.read.jdbc(url, sub, p).head()
    if (row.isNullAt(0)) None
    else Some(row.get(0) match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case d: java.math.BigDecimal => d.longValue()
      case other => other.toString.toLong
    })
  }
}
