package graft.state

import graft.SparkSpec

class StateStoreSpec extends SparkSpec {

  test("commit then read round-trips, upsert merges") {
    val store = new StateStore(spark, tmpDir("state"))
    assert(store.read().isEmpty)
    store.commit(Map(("ds1", "") -> "100", ("ds2", "p1") -> "2024-01-01"), "r1")
    assert(store.highWatermark("ds1").contains("100"))
    store.commit(Map(("ds1", "") -> "200"), "r2")
    val all = store.read()
    assert(all(("ds1", "")) == "200")
    assert(all(("ds2", "p1")) == "2024-01-01")
  }

  test("values with quotes and backslashes survive") {
    val store = new StateStore(spark, tmpDir("state2"))
    store.commit(Map(("d\"s", "p\\x") -> "w\"m"), "r1")
    assert(store.read()((("d\"s"), "p\\x")) == "w\"m")
  }

  test("asDataFrame exposes the state table") {
    val store = new StateStore(spark, tmpDir("state3"))
    store.commit(Map(("a", "") -> "1"), "r")
    assert(store.asDataFrame.count() == 1)
  }
}
