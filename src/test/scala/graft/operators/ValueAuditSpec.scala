package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.ValueAudit._

/** Value-based auditing (ValueAuditGenerator.java:47): column-projection
  * and row-selection policies, the FsAuditSink directory contract, and
  * the atomic publish of audit records. */
class ValueAuditSpec extends SparkSpec {

  private def orders = Tables.load(spark, sf, "orders")

  private val meta = TableMeta("tpch", "orders",
    keyFields = Seq("o_orderkey"),
    deltaFields = Seq("o_orderstatus", "o_totalprice"))

  test("ProjectAll + SelectAll audits every value of every row") {
    val a = audit(orders, meta)
    assert(a.schema == orders.schema)
    assert(a.count() == orders.count())
  }

  test("KeyAndDelta projects exactly the declared field locations, in order") {
    val a = audit(orders, meta, projection = ColumnProjection.KeyAndDelta)
    assert(a.columns.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    // no key/delta locations declared -> refuses rather than auditing nothing
    val e = intercept[IllegalArgumentException] {
      audit(orders, TableMeta("t", "x"),
        projection = ColumnProjection.KeyAndDelta)
    }
    assert(e.getMessage.contains("no key/delta"), e.getMessage)
  }

  test("nested field locations resolve with dots; unknown ones refuse") {
    import spark.implicits._
    val df = Seq((1L, ("a", 2.0)), (2L, ("b", 3.0)))
      .toDF("id", "payload")
      .select(col("id"), col("payload._1").as("name"),
        struct(col("payload._2").as("score")).as("nested"))
    val a = audit(df, TableMeta("d", "t"),
      projection = ColumnProjection.Fields(Seq("id", "nested.score")))
    assert(a.columns.toSeq == Seq("id", "nested_score"))
    assert(a.where(col("id") === 1L).head().getDouble(1) == 2.0)
    val e = intercept[IllegalArgumentException] {
      audit(df, TableMeta("d", "t"),
        projection = ColumnProjection.Fields(Seq("nope.x")))
    }
    assert(e.getMessage.contains("unknown field location"), e.getMessage)
  }

  test("KeyHashSample is deterministic, key-driven, and ~fraction sized") {
    val a1 = audit(orders, meta, selection = RowSelection.KeyHashSample(0.2))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val a2 = audit(orders, meta, selection = RowSelection.KeyHashSample(0.2))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a1 == a2, "same keys must be selected on every run")
    val n = orders.count().toDouble
    assert(a1.size > n * 0.1 && a1.size < n * 0.3,
      s"sample ${a1.size} of $n not ~20%")
    // sampling without declared keys refuses
    intercept[IllegalArgumentException] {
      audit(orders, TableMeta("t", "x"),
        selection = RowSelection.KeyHashSample(0.5)).count()
    }: Unit
  }

  test("auditToFs publishes under the FsAuditSink path contract, atomically") {
    val root = tmpDir("value-audit")
    val rt = RuntimeMeta(phase = Phase.SS_PUB, cluster = "local",
      extractId = "e1", snapshotId = "s42", deltaId = "d7")
    val dir = auditToFs(orders, root, meta, rt,
      projection = ColumnProjection.KeyAndDelta)
    assert(dir ==
      s"$root/tpch/orders/P=SS_PUB_C=local_E=e1_S=s42_D=d7", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    assert(back.columns.sorted.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    // re-audit of the SAME snapshot coordinates replaces, not appends
    auditToFs(orders.limit(10), root, meta, rt,
      projection = ColumnProjection.KeyAndDelta)
    assert(spark.read.parquet(dir).count() == 10)
    // no staging residue
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    assert(!fs.listStatus(parent).exists(_.getPath.getName.startsWith(".staging")))
  }

  test("diff: identical audits produce an all-zero diff") {
    val root = tmpDir("va-diff-same")
    val a = auditToFs(orders.limit(100), root, meta,
      RuntimeMeta(phase = Phase.PULL, snapshotId = "s1"),
      projection = ColumnProjection.KeyAndDelta)
    val b = auditToFs(orders.limit(100), root, meta,
      RuntimeMeta(phase = Phase.SS_PUB, snapshotId = "s1"),
      projection = ColumnProjection.KeyAndDelta)
    val d = ValueAudit.diff(spark, a, b, Seq("o_orderkey")).collect()
    assert(d.map(_.getString(0)).sorted.toSeq ==
      Seq("o_orderstatus", "o_totalprice"))
    assert(d.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0 &&
      r.getLong(3) == 0), d.mkString("; "))
  }

  test("diff: planted corruption, missing keys, and extra keys all surface") {
    val root = tmpDir("va-diff-bad")
    val base = orders.limit(200)
    val a = auditToFs(base, root, meta,
      RuntimeMeta(phase = Phase.PULL, snapshotId = "s2"),
      projection = ColumnProjection.KeyAndDelta)
    // phase B: drops keys %11==0, corrupts o_orderstatus for %7==0
    // survivors, and gains synthetic keys the PULL phase never saw
    val corrupt = base.filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    val extra = base.limit(5)
      .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
    val b = auditToFs(corrupt.unionByName(extra), root, meta,
      RuntimeMeta(phase = Phase.SS_PUB, snapshotId = "s2"),
      projection = ColumnProjection.KeyAndDelta)
    val rows = base.select("o_orderkey").collect().map(_.getLong(0))
    val expOnlyA = rows.count(_ % 11 == 0)
    val expMism = rows.count(k => k % 11 != 0 && k % 7 == 0)
    val d = ValueAudit.diff(spark, a, b, Seq("o_orderkey")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d("o_orderstatus") == ((expMism, expOnlyA, 5L)), d)
    assert(d("o_totalprice") == ((0L, expOnlyA, 5L)), d)
  }

  test("diff: key-only audits still surface lost/gained keys via __key_set__") {
    val root = tmpDir("va-diff-keys")
    val a = auditToFs(orders.limit(50), root, meta,
      RuntimeMeta(phase = Phase.PULL, snapshotId = "k1"),
      projection = ColumnProjection.Fields(Seq("o_orderkey")))
    val b = auditToFs(orders.limit(50).filter(col("o_orderkey") % 5 =!= 0),
      root, meta, RuntimeMeta(phase = Phase.SS_PUB, snapshotId = "k1"),
      projection = ColumnProjection.Fields(Seq("o_orderkey")))
    val d = ValueAudit.diff(spark, a, b, Seq("o_orderkey")).collect()
    assert(d.length == 1 && d.head.getString(0) == "__key_set__", d.toSeq)
    assert(d.head.getLong(2) > 0 && d.head.getLong(3) == 0, d.toSeq)
  }

  test("diff: mismatched projections and unknown keys refuse loudly") {
    val root = tmpDir("va-diff-refuse")
    val a = auditToFs(orders.limit(10), root, meta,
      RuntimeMeta(phase = Phase.PULL, snapshotId = "s3"),
      projection = ColumnProjection.KeyAndDelta)
    val b = auditToFs(orders.limit(10), root, meta,
      RuntimeMeta(phase = Phase.SS_PUB, snapshotId = "s3"),
      projection = ColumnProjection.Fields(Seq("o_orderkey", "o_custkey")))
    val e1 = intercept[IllegalArgumentException] {
      ValueAudit.diff(spark, a, b, Seq("o_orderkey"))
    }
    assert(e1.getMessage.contains("different column sets"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ValueAudit.diff(spark, a, a, Seq("nope"))
    }
    assert(e2.getMessage.contains("key column 'nope'"), e2.getMessage)
  }
}
