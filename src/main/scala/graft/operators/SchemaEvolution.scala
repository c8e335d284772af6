package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema-evolution rules for append-forever tables: decide whether a
  * new batch's schema can land on an existing table, and align a frame
  * to the evolved target.
  *
  * Mirrors the reference's Avro-compatibility surface — schema checks
  * before conversion/registration (gobblin-hive-registration/.../
  * HiveSchemaEvolution.java, gobblin-compaction AvroSchemaCheckStrategy,
  * and the Avro resolution rules its converters rely on):
  *
  *  - numeric promotion only widens: int → long → float → double (and
  *    float → double), never narrows;
  *  - decimals may widen precision/scale when no digits are lost;
  *  - a field the reader adds must be nullable (the Avro "new field
  *    needs a default" rule — null IS the default here);
  *  - a field the reader drops is fine (projection);
  *  - nullability may widen (required → optional), never tighten;
  *  - structs recurse; arrays/maps evolve element/value-wise (map keys
  *    must match exactly — key casts reshuffle semantics).
  */
object SchemaEvolution {

  /** May a value of `from` be read as `to` without loss? */
  def canPromote(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (IntegerType | ShortType | ByteType | LongType,
          FloatType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale
    case (f: StructType, t: StructType) => incompatibilities(f, t).isEmpty
    case (ArrayType(fe, fn), ArrayType(te, tn)) =>
      canPromote(fe, te) && (tn || !fn)
    case (MapType(fk, fv, fn), MapType(tk, tv, tn)) =>
      fk == tk && canPromote(fv, tv) && (tn || !fn)
    case _ => false
  }

  /** Reasons the evolved `reader` schema cannot consume data written
    * with `writer`; empty = backward compatible. */
  def incompatibilities(writer: StructType, reader: StructType,
                        path: String = ""): Seq[String] = {
    def at(n: String) = if (path.isEmpty) n else s"$path.$n"
    reader.fields.toSeq.flatMap { rf =>
      writer.fields.find(_.name == rf.name) match {
        case None =>
          if (rf.nullable) Nil
          else Seq(s"new field '${at(rf.name)}' must be nullable " +
            "(no default for existing rows)")
        case Some(wf) =>
          val tpe = (wf.dataType, rf.dataType) match {
            case (w: StructType, r: StructType) =>
              incompatibilities(w, r, at(rf.name))
            case (w, r) if canPromote(w, r) => Nil
            case (w, r) =>
              Seq(s"field '${at(rf.name)}': cannot promote " +
                s"${w.simpleString} to ${r.simpleString}")
          }
          val nullability =
            if (!rf.nullable && wf.nullable)
              Seq(s"field '${at(rf.name)}' tightens nullability " +
                "(optional -> required)")
            else Nil
          tpe ++ nullability
      }
    }
  }

  def backwardCompatible(writer: StructType, reader: StructType): Boolean =
    incompatibilities(writer, reader).isEmpty

  /** Least widening both `x` and `y` promote into; throws when none
    * exists (e.g. string vs long). */
  private def lub(x: DataType, y: DataType, at: String): DataType =
    (x, y) match {
      case (x, y) if x == y => x
      case (x: StructType, y: StructType) => merge(x, y, at)
      case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
        ArrayType(lub(xe, ye, at), xn || yn)
      case (MapType(xk, xv, xn), MapType(yk, yv, yn)) if xk == yk =>
        MapType(xk, lub(xv, yv, at), xn || yn)
      case (x, y) if canPromote(x, y) => y
      case (x, y) if canPromote(y, x) => x
      case (x, y) => throw new IllegalArgumentException(
        s"field '$at': no common widening of " +
          s"${x.simpleString} and ${y.simpleString}")
    }

  /** Least-upper-bound of two WRITER schemas: the narrowest schema both
    * promote into — common fields widen ([[canPromote]] either way,
    * structs recurse), fields present on one side only join as nullable
    * (their rows on the other side read as null). Field order: `a`'s
    * fields first, then `b`'s new ones — so a table's column order is
    * stable as batches evolve it. Throws when any shared field has no
    * common widening. Post-law (unit-tested): the result is
    * [[backwardCompatible]] with BOTH inputs. */
  def merge(a: StructType, b: StructType, path: String = ""): StructType = {
    def at(n: String) = if (path.isEmpty) n else s"$path.$n"
    val common = a.fields.map { af =>
      b.fields.find(_.name == af.name) match {
        case None => af.copy(nullable = true)
        case Some(bf) => StructField(af.name,
          lub(af.dataType, bf.dataType, at(af.name)),
          af.nullable || bf.nullable)
      }
    }
    val added = b.fields.filterNot(bf => a.fieldNames.contains(bf.name))
      .map(_.copy(nullable = true))
    StructType(common ++ added)
  }

  /** Align one value to its evolved type BY NAME at every nesting level.
    * A plain `cast` is positional for structs (and demands equal field
    * counts), so same-named-but-reordered nested fields would silently
    * swap values and added nested fields would crash — structs are
    * rebuilt field-by-field instead, arrays/maps element-wise. */
  private def align(c: org.apache.spark.sql.Column,
                    from: DataType, to: DataType): org.apache.spark.sql.Column =
    (from, to) match {
      case (f, t) if f == t => c
      case (f: StructType, t: StructType) =>
        val rebuilt = org.apache.spark.sql.functions.struct(
          t.fields.toIndexedSeq.map { tf =>
            f.fields.find(_.name == tf.name) match {
              case Some(ff) => align(c.getField(tf.name), ff.dataType,
                tf.dataType).as(tf.name)
              case None => lit(null).cast(tf.dataType).as(tf.name)
            }
          }: _*)
        // a null struct must stay null, not become a struct of nulls
        org.apache.spark.sql.functions.when(c.isNull,
          lit(null).cast(t)).otherwise(rebuilt)
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        org.apache.spark.sql.functions.transform(c, x => align(x, fe, te))
      case (MapType(_, fv, _), MapType(_, tv, _)) =>
        org.apache.spark.sql.functions.transform_values(
          c, (_, v) => align(v, fv, tv))
      case (_, t) => c.cast(t)
    }

  /** Align a batch to the evolved target schema: add the target's new
    * nullable columns as nulls, promote by NAME at every nesting level,
    * drop columns the target no longer carries, and order columns as the
    * target declares them. Throws (with every reason) when the batch
    * cannot evolve — never silently truncates. */
  def evolve(df: DataFrame, target: StructType): DataFrame = {
    val problems = incompatibilities(
      df.schema, target)
    require(problems.isEmpty,
      s"schema cannot evolve:\n  ${problems.mkString("\n  ")}")
    val cols = target.fields.map { tf =>
      df.schema.fields.find(_.name == tf.name) match {
        case Some(ff) => align(col(tf.name), ff.dataType, tf.dataType).as(tf.name)
        case None => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
