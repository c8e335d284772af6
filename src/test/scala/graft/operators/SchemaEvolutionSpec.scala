package graft.operators

import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def st(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nu) => StructField(n, t, nu) })

  test("numeric promotions widen, never narrow") {
    assert(SchemaEvolution.canPromote(IntegerType, LongType))
    assert(SchemaEvolution.canPromote(IntegerType, DoubleType))
    assert(SchemaEvolution.canPromote(FloatType, DoubleType))
    assert(!SchemaEvolution.canPromote(LongType, IntegerType))
    assert(!SchemaEvolution.canPromote(DoubleType, FloatType))
    assert(!SchemaEvolution.canPromote(LongType, StringType))
    assert(SchemaEvolution.canPromote(DecimalType(10, 2), DecimalType(12, 2)))
    assert(!SchemaEvolution.canPromote(DecimalType(12, 2), DecimalType(10, 2)))
  }

  test("added fields must be nullable; dropped fields are fine") {
    val writer = st(("a", LongType, false), ("b", StringType, true))
    val addNullable = st(("a", LongType, false), ("c", StringType, true))
    assert(SchemaEvolution.backwardCompatible(writer, addNullable))
    val addRequired = st(("a", LongType, false), ("c", StringType, false))
    val reasons = SchemaEvolution.incompatibilities(writer, addRequired)
    assert(reasons.exists(_.contains("'c' must be nullable")))
    val dropped = st(("b", StringType, true))
    assert(SchemaEvolution.backwardCompatible(writer, dropped))
  }

  test("nullability may widen but not tighten; structs recurse with paths") {
    val writer = st(("a", LongType, true),
      ("s", st(("x", IntegerType, false)), false))
    val tighten = st(("a", LongType, false))
    assert(SchemaEvolution.incompatibilities(writer, tighten)
      .exists(_.contains("tightens nullability")))
    val nestedBad = st(("s", st(("x", StringType, false)), false))
    assert(SchemaEvolution.incompatibilities(writer, nestedBad)
      .exists(r => r.contains("'s.x'") && r.contains("cannot promote")))
    val nestedGood = st(("s", st(("x", LongType, false)), false))
    assert(SchemaEvolution.backwardCompatible(writer, nestedGood))
  }

  test("evolve aligns nested structs BY NAME: reorders and adds fields safely") {
    val df = spark.sql(
      "SELECT named_struct('a', 1, 'b', 'x') AS s UNION ALL " +
      "SELECT named_struct('a', 2, 'b', 'y')")
    // target reorders (b, a), widens a to long, adds nullable c
    val target = st(("s", st(("b", StringType, true), ("a", LongType, true),
      ("c", DoubleType, true)), true))
    val out = SchemaEvolution.evolve(df, target).selectExpr(
      "s.a", "s.b", "s.c").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "x"), (2L, "y"))) // values follow NAMES, not positions
    assert(out.forall(_.isNullAt(2)))
    // null structs stay null rather than becoming struct-of-nulls
    val withNull = spark.sql(
      "SELECT CAST(NULL AS struct<a:int, b:string>) AS s")
    assert(SchemaEvolution.evolve(withNull, target).head.isNullAt(0))
  }

  test("evolve aligns, casts, null-fills and orders; rejects loss loudly") {
    val df = Seq((1, "x"), (2, "y")).toDF("a", "b")
    val target = st(("b", StringType, true), ("a", LongType, false),
      ("c", DoubleType, true))
    val out = SchemaEvolution.evolve(df, target)
    assert(out.schema.fields.map(_.name).toSeq == Seq("b", "a", "c"))
    assert(out.schema("a").dataType == LongType)
    val rows = out.collect()
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("x", 1L), ("y", 2L)))

    val narrow = st(("a", IntegerType, false))
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.evolve(df.selectExpr("CAST(a AS LONG) AS a"), narrow)
    }
    assert(e.getMessage.contains("cannot promote"))
  }
}
