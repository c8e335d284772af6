package graft.sinks

import org.apache.spark.sql.types._

/** Hive DDL/DML generation for the Avro→ORC conversion publish path:
  * CREATE EXTERNAL TABLE ... STORED AS ORC (nested types mapped to Hive
  * type strings with escaped inner field names), INSERT OVERWRITE with a
  * partition clause, and ADD/DROP PARTITION statements for the
  * per-partition swap.
  *
  * Reference: HiveAvroORCQueryGenerator
  * (gobblin-data-management/.../hive/query/HiveAvroORCQueryGenerator
  * .java:120 generateCreateTableDDL, :406 escapeHiveType, :485
  * generateTableMappingDML, :315 generateCreatePartitionDDL, :751
  * generateDropPartitionsDDL) and AbstractAvroToOrcConverter.java:84,
  * which emits these statements per conversion unit.
  *
  * Spark-first: the source of truth is the Spark `StructType` (AvroIO
  * already resolves Avro → Catalyst types, including logical types), so
  * the generator is a pure StructType → SQL-string mapping with no Hive
  * serde classes on the classpath. The emitted statements are valid
  * HiveQL against a real metastore; [[CatalogRegister]] stays the
  * session-catalog face for environments without one.
  */
object HiveDdl {

  /** Catalyst type → Hive type string; nested struct field names are
    * backtick-escaped exactly as the reference's escapeHiveType does. */
  def hiveType(dt: DataType): String = dt match {
    case ByteType                => "tinyint"
    case ShortType               => "smallint"
    case IntegerType             => "int"
    case LongType                => "bigint"
    case FloatType               => "float"
    case DoubleType              => "double"
    case BooleanType             => "boolean"
    case StringType              => "string"
    case BinaryType              => "binary"
    case DateType                => "date"
    case TimestampType           => "timestamp"
    case TimestampNTZType        => "timestamp"
    case d: DecimalType          => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _)         => s"array<${hiveType(e)}>"
    case MapType(k, v, _)        => s"map<${hiveType(k)},${hiveType(v)}>"
    case StructType(fields)      =>
      fields.map(f => s"`${f.name}`:${hiveType(f.dataType)}")
        .mkString("struct<", ",", ">")
    case other => throw new IllegalArgumentException(
      s"no Hive mapping for Catalyst type: $other")
  }

  private def q(ident: String): String = s"`$ident`"

  private def qualified(db: String, table: String): String =
    s"${q(db)}.${q(table)}"

  /** Literal for a static partition value in a PARTITION (...) clause. */
  private def partLit(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** CREATE EXTERNAL TABLE ... PARTITIONED BY ... STORED AS ORC.
    * Partition columns are pulled OUT of the column list (Hive keeps
    * them in the metastore only); their types come from the same schema. */
  def createTableDdl(schema: StructType, table: String, location: String,
                     db: String = "default",
                     partitionBy: Seq[String] = Nil,
                     format: String = "ORC",
                     tableProperties: Map[String, String] = Map.empty): String = {
    val missing = partitionBy.filterNot(p => schema.fieldNames.contains(p))
    require(missing.isEmpty, s"partition columns not in schema: $missing")
    val dataCols = schema.fields.filterNot(f => partitionBy.contains(f.name))
    require(dataCols.nonEmpty, "no data columns left after partitioning")
    val colLines = dataCols
      .map(f => s"  ${q(f.name)} ${hiveType(f.dataType)}")
      .mkString(",\n")
    val partClause =
      if (partitionBy.isEmpty) ""
      else partitionBy
        .map(p => s"${q(p)} ${hiveType(schema(p).dataType)}")
        .mkString("PARTITIONED BY (", ", ", ")\n")
    val props =
      if (tableProperties.isEmpty) ""
      else tableProperties.toSeq.sorted
        .map { case (k, v) => s"${partLit(k)}=${partLit(v)}" }
        .mkString("TBLPROPERTIES (", ", ", ")\n")
    s"""CREATE EXTERNAL TABLE IF NOT EXISTS ${qualified(db, table)} (
       |$colLines
       |)
       |$partClause""".stripMargin +
      s"STORED AS $format\nLOCATION ${partLit(location)}\n" + props
  }

  /** INSERT OVERWRITE TABLE dst [PARTITION (...)] SELECT ... FROM src.
    * Static partition values pin a single partition (the reference's
    * per-partition conversion unit); remaining partition columns ride as
    * dynamic partitions and must come LAST in the select, which this
    * generator enforces by construction. */
  def insertOverwriteDml(schema: StructType, srcTable: String,
                         dstTable: String,
                         db: String = "default",
                         partitionBy: Seq[String] = Nil,
                         staticPartition: Map[String, String] = Map.empty): String = {
    val unknown = staticPartition.keySet.diff(partitionBy.toSet)
    require(unknown.isEmpty, s"static partition values for non-partition columns: $unknown")
    val dataCols = schema.fields.filterNot(f => partitionBy.contains(f.name))
    val dynamicParts = partitionBy.filterNot(staticPartition.contains)
    val partClause =
      if (partitionBy.isEmpty) ""
      else partitionBy.map { p =>
        staticPartition.get(p)
          .fold(q(p))(v => s"${q(p)}=${partLit(v)}")
      }.mkString("PARTITION (", ", ", ")\n")
    val selectCols =
      (dataCols.map(f => s"  ${q(f.name)}") ++ dynamicParts.map(p => s"  ${q(p)}"))
        .mkString(",\n")
    s"""INSERT OVERWRITE TABLE ${qualified(db, dstTable)}
       |$partClause""".stripMargin +
      s"SELECT\n$selectCols\nFROM ${qualified(db, srcTable)}\n"
  }

  /** ALTER TABLE ... ADD IF NOT EXISTS PARTITION (...) LOCATION '...' —
    * the publish step after a partition-directory swap. `spec` keys keep
    * `partitionBy` order (Hive requires full, ordered specs). */
  def addPartitionDdl(table: String, spec: Seq[(String, String)],
                      location: String, db: String = "default"): String = {
    require(spec.nonEmpty, "empty partition spec")
    val s = spec.map { case (k, v) => s"${q(k)}=${partLit(v)}" }.mkString(", ")
    s"ALTER TABLE ${qualified(db, table)} ADD IF NOT EXISTS " +
      s"PARTITION ($s) LOCATION ${partLit(location)}"
  }

  /** ALTER TABLE ... DROP IF EXISTS PARTITION (...) — retention's face. */
  def dropPartitionDdl(table: String, spec: Seq[(String, String)],
                       db: String = "default"): String = {
    require(spec.nonEmpty, "empty partition spec")
    val s = spec.map { case (k, v) => s"${q(k)}=${partLit(v)}" }.mkString(", ")
    s"ALTER TABLE ${qualified(db, table)} DROP IF EXISTS PARTITION ($s)"
  }

  /** Parse a swapped partition sub-path ("d=2024-01-01/h=3") back into an
    * ordered spec for [[addPartitionDdl]]; partition values are
    * URL-decoded the way Spark/Hive encode them on disk. */
  def specFromPath(rel: String): Seq[(String, String)] =
    rel.split("/").toSeq.filter(_.nonEmpty).map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"not a partition path segment: $seg")
      seg.substring(0, i) ->
        java.net.URLDecoder.decode(seg.substring(i + 1), "UTF-8")
    }

  /** The complete publish script for one converted dataset: CREATE the
    * destination if needed, then ADD each swapped partition. Mirrors the
    * reference's QueryBasedHivePublishEntity command list. */
  def publishScript(schema: StructType, table: String, location: String,
                    swappedPartitions: Seq[String],
                    db: String = "default",
                    partitionBy: Seq[String] = Nil): Seq[String] =
    createTableDdl(schema, table, location, db, partitionBy) +:
      swappedPartitions.map(rel =>
        addPartitionDdl(table, specFromPath(rel), s"$location/$rel", db))

  /** ALTER statements evolving a registered table to the new schema —
    * the reference's generateEvolutionDDL (HiveAvroORCQueryGenerator
    * .java:665): a field whose type widened becomes CHANGE COLUMN, a new
    * field becomes ADD COLUMNS, and an incompatible change (narrowing, a
    * type with no common widening) throws instead of emitting DDL that
    * would corrupt readers. Widening legality delegates to the engine's
    * one source of truth, [[graft.operators.SchemaEvolution.canPromote]],
    * so the catalog face and the frame face can never disagree. */
  def evolutionDdl(existing: StructType, evolved: StructType, table: String,
                   db: String = "default",
                   tableProperties: Map[String, String] = Map.empty): Seq[String] = {
    import graft.operators.SchemaEvolution.canPromote
    val byName = existing.fields.map(f => f.name.toLowerCase -> f).toMap
    val ddl = scala.collection.mutable.ListBuffer.empty[String]
    evolved.fields.foreach { f =>
      byName.get(f.name.toLowerCase) match {
        case Some(dest) if dest.dataType == f.dataType => () // unchanged
        case Some(dest) =>
          require(canPromote(dest.dataType, f.dataType),
            s"incompatible type evolution for ${qualified(db, table)}.${f.name}: " +
              s"${hiveType(dest.dataType)} -> ${hiveType(f.dataType)}")
          ddl += s"ALTER TABLE ${qualified(db, table)} CHANGE COLUMN " +
            s"${q(f.name)} ${q(f.name)} ${hiveType(f.dataType)}"
        case None =>
          ddl += s"ALTER TABLE ${qualified(db, table)} ADD COLUMNS " +
            s"(${q(f.name)} ${hiveType(f.dataType)})"
      }
    }
    ddl ++= tableProperties.toSeq.sorted.map { case (k, v) =>
      s"ALTER TABLE ${qualified(db, table)} SET TBLPROPERTIES (${partLit(k)}=${partLit(v)})"
    }
    ddl.toSeq
  }

  /** The two count queries validating a conversion — rows in source and
    * destination, optionally scoped to one partition — whose results the
    * caller compares (HiveValidationQueryGenerator
    * .generateCountValidationQueries). */
  def countValidationQueries(srcTable: String, dstTable: String,
                             srcDb: String = "default",
                             dstDb: String = "default",
                             partition: Seq[(String, String)] = Nil): Seq[String] = {
    val where =
      if (partition.isEmpty) ""
      else partition.map { case (k, v) => s"${q(k)}=${partLit(v)}" }
        .mkString(" WHERE ", " AND ", "")
    Seq(s"SELECT count(*) FROM ${qualified(srcDb, srcTable)}$where",
      s"SELECT count(*) FROM ${qualified(dstDb, dstTable)}$where")
  }

  /** Row-match count between source and converted tables: a join on every
    * comparable column with NULL-SAFE equality (`<=>`), map columns
    * excluded — Hive cannot join on maps (HiveValidationQueryGenerator
    * .generateDataValidationQuery). The caller compares the result to the
    * source count. */
  def dataValidationQuery(schema: StructType, srcTable: String,
                          dstTable: String, srcDb: String = "default",
                          dstDb: String = "default",
                          partition: Seq[(String, String)] = Nil): String = {
    def joinable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case StructType(fs) => fs.forall(f => joinable(f.dataType))
      case ArrayType(e, _) => joinable(e)
      case _ => true
    }
    val cols = schema.fields.filter(f => joinable(f.dataType))
    require(cols.nonEmpty, "no joinable columns (all map-typed)")
    val on = cols.map(f => s"s.${q(f.name)}<=>t.${q(f.name)}")
      .mkString(" AND ")
    val where =
      if (partition.isEmpty) ""
      else partition.map { case (k, v) => s"s.${q(k)}=${partLit(v)}" }
        .mkString(" WHERE ", " AND ", "")
    s"SELECT count(*) FROM ${qualified(srcDb, srcTable)} s JOIN " +
      s"${qualified(dstDb, dstTable)} t ON $on$where"
  }
}
