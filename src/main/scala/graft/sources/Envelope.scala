package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}

/** Envelope decode: records arrive as (schema_id, payload-bytes) and the
  * payload deserializes with the WRITER schema looked up by id in a
  * registry, resolved against a declared READER schema (Avro schema
  * resolution: renamed-with-alias / added-with-default fields work, so a
  * topic can mix schema versions).
  *
  * Reference: EnvelopeSchemaConverter
  * (gobblin-modules/gobblin-kafka-common/.../converter/
  * EnvelopeSchemaConverter.java:57) — fetch schema by id from the
  * registry, deserialize the nested payload, emit the payload record.
  *
  * The registry here is an explicit Map (the sandbox has no network); a
  * remote registry client plugs in by building the same map at plan time.
  *
  * Scale: map-only; per partition one DatumReader per distinct schema id
  * and one reused BinaryDecoder — no per-record allocation beyond the
  * decoded record itself, mirroring the reference's per-task deserializer
  * cache.
  */
object Envelope {

  /** Decode payloadCol with the writer schema chosen by schemaIdCol;
    * output rows have the reader schema's columns. */
  def decodeAvro(df: DataFrame, schemaIdCol: String, payloadCol: String,
                 registry: Map[Long, String],
                 readerSchemaJson: String): DataFrame = {
    val spark = df.sparkSession
    val readerStruct = AvroIO.sparkSchemaFor(
      new Schema.Parser().parse(readerSchemaJson))
    val idIdx = df.schema.fieldIndex(schemaIdCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val rows = df.rdd.mapPartitions { it =>
      val reader = new Schema.Parser().parse(readerSchemaJson)
      val writers = registry.map { case (id, js) =>
        id -> new Schema.Parser().parse(js)
      }
      val readers = scala.collection.mutable.Map.empty[Long, GenericDatumReader[GenericRecord]]
      var decoder: BinaryDecoder = null
      it.map { row =>
        val id = row.getLong(idIdx)
        val dr = readers.getOrElseUpdate(id,
          new GenericDatumReader[GenericRecord](
            writers.getOrElse(id,
              throw new IllegalArgumentException(s"schema id $id not in registry")),
            reader))
        decoder = DecoderFactory.get()
          .binaryDecoder(row.getAs[Array[Byte]](payIdx), decoder)
        AvroIO.fromAvro(dr.read(null, decoder), reader).asInstanceOf[Row]
      }
    }
    spark.createDataFrame(rows, readerStruct)
  }

  /** Inverse (test/producer side): rows -> (schema_id, payload) envelopes
    * binary-encoded with the given writer schema. */
  def encodeAvro(df: DataFrame, schemaJson: String, schemaId: Long): DataFrame = {
    val spark = df.sparkSession
    val out = StructType(Seq(
      StructField("schema_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      var encoder: BinaryEncoder = null
      it.map { row =>
        val bos = new java.io.ByteArrayOutputStream()
        encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
        writer.write(AvroIO.toAvro(row, schema).asInstanceOf[GenericRecord], encoder)
        encoder.flush()
        Row(schemaId, bos.toByteArray)
      }
    }
    spark.createDataFrame(rows, out)
  }

}
