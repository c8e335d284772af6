package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._

/** The reference's JSON-intermediate schema dialect — an array of
  * `{columnName, dataType:{type,...}, isNullable}` column objects —
  * parsed to/rendered from Spark StructType, so a job config written for
  * the reference ports verbatim.
  *
  * Reference: JsonSchema (gobblin-core/.../converter/json/JsonSchema.java:
  * 46-60 key names, 291-294 column parsing) and
  * JsonElementConversionFactory.java:66-160 (the type surface: DATE,
  * TIMESTAMP, TIME, FIXED, STRING, BYTES, INT, LONG, FLOAT, DOUBLE,
  * BOOLEAN, ARRAY, MAP, ENUM, RECORD, NULL, UNION). Fixture:
  * gobblin-core/src/test/resources/converter/schema.json.
  *
  * Mapping notes:
  *  - `enum` → StringType with the symbols kept in field metadata
  *    (Spark validates enums via a row policy, not the type system);
  *  - `fixed` → BinaryType with `size` metadata;
  *  - `union` → nullable member when one branch is "null" (Avro's
  *    optional idiom); otherwise a struct of member0..memberN-1 —
  *    the spark-avro convention;
  *  - documentation-only properties (comment, length, precision, scale,
  *    primaryKey, waterMark) ride in field metadata and round-trip.
  */
object JsonSchemaDialect {

  private val mapper = new ObjectMapper()

  /** Accepts the bare column array, the `{"schema":[...]}` wrapper, or a
    * single record dataType object. */
  def parse(json: String): StructType = {
    val root = mapper.readTree(json)
    val arr =
      if (root.isArray) root
      else if (root.has("schema") && root.get("schema").isArray) root.get("schema")
      else if (root.has("dataType")) // single column object: wrap
        mapper.createArrayNode().add(root)
      else throw new IllegalArgumentException(
        s"not a JSON-intermediate schema: ${json.take(80)}")
    StructType(iter(arr).map(parseColumn).toArray)
  }

  private def iter(n: JsonNode): Iterator[JsonNode] = {
    val it = n.elements()
    Iterator.continually(()).takeWhile(_ => it.hasNext).map(_ => it.next())
  }

  private val metaProps =
    Seq("comment", "length", "precision", "scale", "primaryKey", "waterMark",
      "unique", "defaultValue", "source.type")

  private def parseColumn(colNode: JsonNode): StructField = {
    require(colNode.has("columnName") && colNode.has("dataType"),
      s"column object needs columnName + dataType: $colNode")
    val name = colNode.get("columnName").asText()
    val dt = colNode.get("dataType")
    val (dataType, unionNullable) = parseDataType(dt)
    // isNullable defaults FALSE (JsonSchema.java:293); a null union branch
    // also makes the field nullable
    val nullable =
      (colNode.has("isNullable") && colNode.get("isNullable").asBoolean()) ||
        unionNullable
    val mb = new MetadataBuilder()
    metaProps.foreach { p =>
      if (colNode.has(p)) {
        val v = colNode.get(p)
        if (v.isNumber) mb.putLong(p, v.asLong())
        else if (v.isBoolean) mb.putBoolean(p, v.asBoolean())
        else mb.putString(p, v.asText())
      }
    }
    if (dt.has("symbols"))
      mb.putStringArray("enumSymbols", iter(dt.get("symbols")).map(_.asText()).toArray)
    if (dt.has("name")) mb.putString("enumName", dt.get("name").asText())
    if (dt.has("size")) mb.putLong("size", dt.get("size").asLong())
    StructField(name, dataType, nullable, mb.build())
  }

  /** (sparkType, nullableViaUnion) for a dataType node. */
  private def parseDataType(dt: JsonNode): (DataType, Boolean) = {
    val typeNode = dt.get("type")
    require(typeNode != null, s"dataType without type: $dt")
    if (typeNode.isArray) { // UNION: "type": ["null", "string", ...]
      val members = iter(typeNode).map(_.asText()).toSeq
      val nonNull = members.filterNot(_ == "null")
      val sparkMembers = nonNull.map(primitive)
      val t = sparkMembers match {
        case Seq(one) => one
        case many => StructType(many.zipWithIndex.map { case (m, i) =>
          StructField(s"member$i", m, nullable = true) })
      }
      (t, members.contains("null"))
    } else typeNode.asText() match {
      case "record" =>
        // RECORD_FIELDS_KEY = "values" (JsonSchema.java:46)
        (StructType(iter(dt.get("values")).map(parseColumn).toArray), false)
      case "array" =>
        (ArrayType(nested(dt.get("items"))), false)
      case "map" => // avro maps: string keys
        (MapType(StringType, nested(dt.get("values"))), false)
      case "enum" => (StringType, false)
      case "fixed" => (BinaryType, false)
      case prim => (primitive(prim), false)
    }
  }

  /** items/values can be a primitive name, a bare dataType object, or a
    * full column object (JsonSchema.getItemsWithinDataType handles all
    * three). */
  private def nested(n: JsonNode): DataType = {
    require(n != null, "array/map dataType needs items/values")
    if (n.isTextual) primitive(n.asText())
    else if (n.has("dataType")) parseDataType(n.get("dataType"))._1
    else parseDataType(n)._1
  }

  private def primitive(name: String): DataType = name match {
    case "string"    => StringType
    case "bytes"     => BinaryType
    case "int"       => IntegerType
    case "long"      => LongType
    case "float"     => FloatType
    case "double"    => DoubleType
    case "boolean"   => BooleanType
    case "null"      => NullType
    case "date"      => DateType
    case "timestamp" => TimestampType
    case "time"      => TimeType(6) // micros, Spark 4's TIME type
    case "enum"      => StringType
    case "fixed"     => BinaryType
    case other =>
      throw new IllegalArgumentException(s"unsupported dialect type: $other")
  }

  // ---- render: StructType -> the dialect (inverse of parse) ----

  def render(schema: StructType): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("schema")
    schema.fields.foreach(f => arr.add(renderColumn(f)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def renderColumn(f: StructField): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("columnName", f.name)
    o.set[ObjectNode]("dataType", renderDataType(f.dataType, f.metadata))
    o.put("isNullable", f.nullable)
    metaProps.foreach { p =>
      if (f.metadata.contains(p)) {
        // metadata is typed; probe in the order parse stored them
        try o.put(p, f.metadata.getLong(p)) catch { case _: Exception =>
          try o.put(p, f.metadata.getBoolean(p)) catch { case _: Exception =>
            o.put(p, f.metadata.getString(p)) } }
      }
    }
    o
  }

  private def renderDataType(t: DataType, meta: Metadata): ObjectNode = {
    val o = mapper.createObjectNode()
    t match {
      case st: StructType =>
        o.put("type", "record")
        val vals = o.putArray("values")
        st.fields.foreach(f => vals.add(renderColumn(f)))
      case ArrayType(et, _) =>
        o.put("type", "array")
        o.set[ObjectNode]("items", renderNested(et))
        ()
      case MapType(_, vt, _) =>
        o.put("type", "map")
        o.set[ObjectNode]("values", renderNested(vt))
        ()
      case StringType if meta.contains("enumSymbols") =>
        o.put("type", "enum")
        if (meta.contains("enumName")) o.put("name", meta.getString("enumName"))
        val syms = o.putArray("symbols")
        meta.getStringArray("enumSymbols").foreach(syms.add)
      case BinaryType if meta.contains("size") =>
        o.put("type", "fixed")
        o.put("size", meta.getLong("size"))
        ()
      case prim =>
        o.put("type", primitiveName(prim))
        ()
    }
    o
  }

  private def renderNested(t: DataType): JsonNode = t match {
    case st: StructType =>
      val o = mapper.createObjectNode()
      o.put("type", "record")
      val vals = o.putArray("values")
      st.fields.foreach(f => vals.add(renderColumn(f)))
      o
    case other => renderDataType(other, Metadata.empty)
  }

  private def primitiveName(t: DataType): String = t match {
    case StringType    => "string"
    case BinaryType    => "bytes"
    case IntegerType   => "int"
    case LongType      => "long"
    case FloatType     => "float"
    case DoubleType    => "double"
    case BooleanType   => "boolean"
    case NullType      => "null"
    case DateType      => "date"
    case TimestampType => "timestamp"
    case _: TimeType   => "time"
    case other =>
      throw new IllegalArgumentException(s"no dialect name for $other")
  }
}
