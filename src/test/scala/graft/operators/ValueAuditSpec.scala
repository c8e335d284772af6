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
}
