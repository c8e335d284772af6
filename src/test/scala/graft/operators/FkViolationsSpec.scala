package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FkViolationsSpec extends SparkSpec {
  import spark.implicits._

  test("orphans are exactly the child rows with no parent key") {
    val child = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val got = Quality.fkViolations(child, parent, Map("fk" -> "pk"))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("null child keys count as violations") {
    val child = Seq((1L, Some(10L)), (2L, None)).toDF("id", "fk")
    val parent = Seq((10L, "a")).toDF("pk", "name")
    val got = Quality.fkViolations(child, parent, Map("fk" -> "pk"))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("composite keys must match on every column") {
    val child = Seq((1L, "x", 1L), (2L, "x", 2L)).toDF("id", "a", "b")
    val parent = Seq(("x", 1L)).toDF("pa", "pb")
    val got = Quality.fkViolations(child, parent,
      Map("a" -> "pa", "b" -> "pb")).select("id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("intact real relationships have zero violations") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    assert(Quality.fkViolations(orders, customer,
      Map("o_custkey" -> "c_custkey")).isEmpty)
    val lineitem = Tables.load(spark, sf, "lineitem")
    assert(Quality.fkViolations(lineitem, orders,
      Map("l_orderkey" -> "o_orderkey")).isEmpty)
  }
}
