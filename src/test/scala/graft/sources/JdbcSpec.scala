package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.pipeline.{PipelineRunner, PipelineSpec}
import graft.sinks.JdbcWriter
import graft.sinks.JdbcWriter.JdbcSpec

/** Embedded-Derby round trips for the JDBC source/sink pair. */
class JdbcSourceSinkSpec extends SparkSpec {
  import spark.implicits._

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  test("staged write publishes atomically and round-trips values") {
    val u = url("t_staged")
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
    JdbcWriter.writeStaged(df, JdbcSpec(u, "people"))
    val back = spark.read.jdbc(u, "people", new java.util.Properties())
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // staging table must be gone after publish
    val conn = java.sql.DriverManager.getConnection(u)
    val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
    var names = List.empty[String]
    while (rs.next()) names ::= rs.getString("TABLE_NAME")
    conn.close()
    assert(!names.exists(_.equalsIgnoreCase("people_stg")))
  }

  test("staged write: append accumulates, overwrite replaces") {
    val u = url("t_modes")
    val df1 = Seq((1L, "a")).toDF("id", "v")
    val df2 = Seq((2L, "b")).toDF("id", "v")
    JdbcWriter.writeStaged(df1, JdbcSpec(u, "t"))
    JdbcWriter.writeStaged(df2, JdbcSpec(u, "t", SaveMode.Append))
    assert(spark.read.jdbc(u, "t", new java.util.Properties()).count() == 2)
    JdbcWriter.writeStaged(df2, JdbcSpec(u, "t", SaveMode.Overwrite))
    assert(spark.read.jdbc(u, "t", new java.util.Properties()).count() == 1)
  }

  test("staged publish scopes the existence probe to the current schema") {
    val u = url("t_xschema")
    val conn = java.sql.DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.executeUpdate("CREATE SCHEMA OTHERS")
    st.executeUpdate("CREATE TABLE OTHERS.SCOPED(x INT)")
    st.close(); conn.close()
    // a same-named table in another schema must not suppress CREATE TABLE
    // in the current schema (the unqualified INSERT would then fail)
    val df = Seq((1L, "a")).toDF("id", "v")
    JdbcWriter.writeStaged(df, JdbcSpec(u, "scoped"))
    assert(spark.read.jdbc(u, "scoped", new java.util.Properties()).count() == 1)
  }

  test("incremental read: chunk predicates = partitions, union covers interval") {
    val u = url("t_inc")
    val nation = Tables.load(spark, sf, "nation")
    JdbcWriter.writeStaged(nation, JdbcSpec(u, "nation", SaveMode.Overwrite))
    val preds = JdbcIncremental.numericPredicates("n_nationkey", -1L, 1000L, 4)
    assert(preds.length == 4)
    val back = JdbcIncremental.read(spark, u, "nation", preds)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == nation.count())
    // non-overlapping chunks: no duplicate keys after union
    assert(back.select("n_nationkey").distinct().count() == nation.count())
    // empty interval preserves schema, returns nothing
    val empty = JdbcIncremental.read(spark, u, "nation",
      JdbcIncremental.numericPredicates("n_nationkey", 5L, 5L, 4))
    assert(empty.count() == 0)
  }

  test("maxWatermark probes the database side") {
    val u = url("t_max")
    Seq((10L, "x"), (42L, "y")).toDF("wm", "v")
      .write.mode("overwrite").jdbc(u, "t", new java.util.Properties())
    assert(JdbcIncremental.maxWatermark(spark, u, "t", "wm").contains(42L))
  }

  test("jdbc fork branch stages and publishes with commit-on-full-success") {
    import graft.operators.Fork
    import graft.sinks.AtomicPublisher.WriteSpec
    val u = url("t_forkjdbc")
    val out = tmpDir("jdbc-fork")
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    val branches = Seq(
      Fork.Branch("files", None, identity, s"$out/files"),
      Fork.Branch("db", None, identity, "orders_out",
        WriteSpec(format = "jdbc", options = Map("url" -> u))))
    val r = Fork.run(orders, branches, "fr1")
    val inDb = spark.read.jdbc(u, "orders_out", new java.util.Properties())
    assert(inDb.count() == orders.count())
    assert(r("db").written == orders.count())

    // a rejected run must leave BOTH the files and the table untouched
    intercept[IllegalStateException] {
      Fork.run(orders.limit(3), branches, "fr2",
        beforePromote = _ => throw new IllegalStateException("policy"))
    }
    assert(spark.read.jdbc(u, "orders_out", new java.util.Properties())
      .count() == orders.count())
    assert(spark.read.parquet(s"$out/files").count() == orders.count())
    // jdbc staging table cleaned up by abort
    val conn = java.sql.DriverManager.getConnection(u)
    val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
    var names = List.empty[String]
    while (rs.next()) names ::= rs.getString("TABLE_NAME")
    conn.close()
    assert(!names.exists(_.toLowerCase.startsWith("orders_out_stg")))
  }

  test("pipeline e2e with a jdbc source: filters push into the scan") {
    val u = url("t_pipe")
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    JdbcWriter.writeStaged(orders, JdbcSpec(u, "orders", SaveMode.Overwrite))
    val out = tmpDir("jdbc-pipe-out")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "jdbc-e2e",
      "source.format" -> "jdbc",
      "source.option.url" -> u,
      "source.option.dbtable" -> "orders",
      "transform.1" -> "filter:o_totalprice > 100000",
      "fork.1.name" -> "main",
      "fork.1.out" -> s"$out/main"))
    val res = PipelineRunner.run(spark, spec, "run1")
    val expected = orders.filter(col("o_totalprice") > 100000).count()
    assert(res.extracted == expected)
    assert(spark.read.parquet(s"$out/main").count() == expected)
  }
}
