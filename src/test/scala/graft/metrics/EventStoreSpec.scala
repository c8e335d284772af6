package graft.metrics

import graft.SparkSpec

class EventStoreSpec extends SparkSpec {

  test("events bubbling through the context tree persist and query back") {
    val store = new EventStore(spark, tmpDir("events"))
    val root = MetricContext.root("job")
    root.addEventListener(store.listener)
    val leaf = root.childContext("task").childContext("fork0")
    leaf.submitEvent(TrackingEvent("graft", "TaskCompleted", 100L,
      Map("task" -> "t1", "note" -> "he said \"ok\"")))
    root.submitEvent(TrackingEvent("graft", "JobCompleted", 200L))
    assert(store.pending == 2)
    assert(store.flush("f1") == 2)
    assert(store.pending == 0)
    assert(store.flush("f2") == 0) // empty flush writes nothing

    val t = store.table.orderBy("timestamp_ms").collect()
    assert(t.length == 2)
    assert(t.head.getAs[String]("name") == "TaskCompleted")
    assert(t.head.getAs[Map[String, String]]("metadata")("note") ==
      "he said \"ok\"")
    assert(t.last.getAs[Long]("timestamp_ms") == 200L)
  }

  test("duplicate flushId is refused and loses no events") {
    val store = new EventStore(spark, tmpDir("events-dup"))
    val ctx = MetricContext.root("j")
    ctx.addEventListener(store.listener)
    ctx.submitEvent(TrackingEvent("g", "E1", 1L))
    assert(store.flush("same") == 1)
    ctx.submitEvent(TrackingEvent("g", "E2", 2L))
    intercept[Exception] { store.flush("same") }
    assert(store.pending == 1) // E2 still buffered after the refusal
    assert(store.flush("fresh") == 1)
    assert(store.table.count() == 2)
  }

  test("empty store is column-addressable") {
    val store = new EventStore(spark, tmpDir("events-empty"))
    assert(store.table.filter("name = 'X'").count() == 0)
  }
}
