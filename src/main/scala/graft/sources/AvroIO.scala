package graft.sources

import java.nio.ByteBuffer
import java.sql.{Date, Timestamp}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file read/write on top of avro-mapred's
  * AvroKeyInput/OutputFormat — Avro is the reference's lingua franca
  * (AvroHdfsDataWriter: gobblin-core/.../writer/AvroHdfsDataWriter.java:51;
  * the whole converter library speaks GenericRecord) and no spark-avro jar
  * ships in this environment, so the bridge maps GenericRecord <-> Row
  * directly.
  *
  * Type coverage mirrors the reference's JsonElementConversionFactory
  * surface (gobblin-core/.../converter/avro/JsonElementConversionFactory
  * .java:66-83): null/boolean/int/long/float/double/string/bytes/enum/
  * fixed/array/map/record, nullable = union(null, T), plus the
  * timestamp-micros and date logical types Spark needs.
  *
  * Scale: both directions are map-only over Hadoop splits (container
  * files split on sync markers, so parallelism follows file blocks, same
  * as any splittable format); schemas travel as JSON strings and are
  * parsed once per partition.
  */
object AvroIO {

  // ---- schema: StructType -> Avro ----------------------------------------

  def avroSchemaFor(st: StructType, name: String = "row",
                    namespace: String = "graft"): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = avroType(f.dataType, s"${name}_${f.name}", namespace)
      val typ =
        if (f.nullable) Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, typ, null, null)
    }
    Schema.createRecord(name, null, namespace, false, fields.asJava)
  }

  private def avroType(dt: DataType, name: String, ns: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, containsNull) =>
      val e = avroType(et, s"${name}_item", ns)
      Schema.createArray(
        if (containsNull) Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), e))
        else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = avroType(vt, s"${name}_value", ns)
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), v))
        else v)
    case st: StructType => avroSchemaFor(st, name, ns)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro mapping: $other")
  }

  // ---- schema: Avro -> StructType ----------------------------------------

  def sparkSchemaFor(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"top level must be record: $s")
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = sparkType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only union(null, T) supported: $s")
      (sparkType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null &&
          s.getLogicalType.getName == "date") (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType == null) (LongType, false)
      else s.getLogicalType.getName match {
        case "timestamp-micros"       => (TimestampType, false)
        case "local-timestamp-micros" => (TimestampNTZType, false)
        case _                        => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, n) = sparkType(s.getElementType)
      (ArrayType(et, n), false)
    case Schema.Type.MAP =>
      val (vt, n) = sparkType(s.getValueType)
      (MapType(StringType, vt, n), false)
    case Schema.Type.RECORD => (sparkSchemaFor(s), false)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  // ---- values ------------------------------------------------------------

  private[sources] def toAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        toAvro(v, s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        s.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(i, toAvro(row.get(i), f.schema()))
        }
        rec
      case Schema.Type.ARRAY =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvro(_, s.getElementType)).asJava
      case Schema.Type.MAP =>
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, mv) => k -> toAvro(mv, s.getValueType) }.toMap.asJava
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros" =>
        v match { // java.sql vs java.time externals (datetime.java8API)
          case t: Timestamp =>
            // getTime's millis already include the fractional second ->
            // whole seconds + full nano field (floorDiv for pre-epoch)
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          case i: java.time.Instant =>
            Math.floorDiv(i.getEpochSecond, 1L) * 1000000L + i.getNano / 1000
        }
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "local-timestamp-micros" =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000
      case Schema.Type.INT if s.getLogicalType != null &&
          s.getLogicalType.getName == "date" =>
        v match {
          case d: Date => d.toLocalDate.toEpochDay.toInt
          case l: java.time.LocalDate => l.toEpochDay.toInt
        }
      case Schema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.STRING => v.toString
      case _ => v
    }
  }

  private[sources] def fromAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        fromAvro(v, s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          fromAvro(rec.get(f.pos()), f.schema())))
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(fromAvro(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> fromAvro(mv, s.getValueType)
        }.toMap
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros" =>
        Timestamp.from(java.time.Instant.EPOCH.plus(
          v.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS))
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "local-timestamp-micros" =>
        val us = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case Schema.Type.INT if s.getLogicalType != null &&
          s.getLogicalType.getName == "date" =>
        Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Schema.Type.BYTES =>
        val b = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
      case Schema.Type.FIXED =>
        v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case _ => v
    }
  }

  // ---- read / write ------------------------------------------------------

  /** Writer schema of the first container file under `path`. */
  def readSchema(spark: SparkSession, path: String): Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = (if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    else Seq(p)).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files in $path"))
    val in = fs.open(file)
    var reader: org.apache.avro.file.DataFileStream[GenericRecord] = null
    try {
      reader = new org.apache.avro.file.DataFileStream(
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      reader.getSchema
    } finally {
      // DataFileStream.close closes the wrapped stream; if its
      // constructor threw (corrupt file) close the stream ourselves
      if (reader != null) reader.close() else in.close()
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = readSchema(spark, path)
    val schemaJson = schema.toString
    val structType = sparkSchemaFor(schema)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val rows = rdd.mapPartitions { it =>
      val s = new Schema.Parser().parse(schemaJson)
      it.map { case (k, _) => fromAvro(k.datum(), s).asInstanceOf[Row] }
    }
    spark.createDataFrame(rows, structType)
  }

  def write(df: DataFrame, path: String, recordName: String = "row"): Unit = {
    val avroSchema = avroSchemaFor(df.schema, recordName)
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { it =>
      val s = new Schema.Parser().parse(schemaJson)
      it.map(r => (new AvroKey(toAvro(r, s).asInstanceOf[GenericRecord]),
        NullWritable.get()))
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}
