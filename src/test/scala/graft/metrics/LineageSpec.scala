package graft.metrics

import graft.SparkSpec
import graft.pipeline.{PipelineRunner, PipelineSpec}
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("one event per DISTINCT destination; branch id is not event identity") {
    val c = new LineageCollector("job1")
    c.setSource(DatasetDescriptor("parquet", "/in/data"))
    c.putDestination(1, Seq(DatasetDescriptor("parquet", "/out/a")))
    c.putDestination(2, Seq(DatasetDescriptor("parquet", "/out/b"),
      DatasetDescriptor("parquet", "/out/a"))) // same dest as branch 1
    val ev = c.events(1000L)
    assert(ev.size == 2) // /out/a collapsed across branches
    assert(ev.forall(_.namespace == Lineage.Namespace))
    assert(ev.forall(_.name == "job1"))
    assert(ev.forall(_.metadata("eventType") == Lineage.EventType))
    assert(ev.map(_.metadata("destination.name")).toSet == Set("/out/a", "/out/b"))
    assert(ev.forall(_.metadata("source.name") == "/in/data"))
    // descriptor JSON is stable and parseable
    assert(ev.head.metadata("source").contains("\"platform\":\"parquet\""))
  }

  test("puts before the source is set are dropped, not fatal") {
    val c = new LineageCollector("job2")
    c.putDestination(1, Seq(DatasetDescriptor("parquet", "/out/x")))
    assert(c.events(0L).isEmpty)
    c.setSource(DatasetDescriptor("jdbc", "db.table"))
    assert(c.events(0L).isEmpty) // the early put stayed dropped
  }

  test("descriptor JSON sorts metadata keys so identity is value identity") {
    val a = DatasetDescriptor("fs", "/p", Map("b" -> "2", "a" -> "1"))
    val b = DatasetDescriptor("fs", "/p", Map("a" -> "1", "b" -> "2"))
    assert(a.json == b.json)
    assert(a == b)
  }

  test("pipeline e2e: published branches land lineage events in the state event store") {
    val dir = tmpDir("lineage-e2e")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .write.parquet(s"$dir/in")
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "lineage-job",
      "source.format" -> "parquet",
      "source.path" -> s"$dir/in",
      "fork.1.name" -> "all",
      "fork.1.out" -> s"$dir/out/all",
      "fork.2.name" -> "big",
      "fork.2.filter" -> "v >= 20",
      "fork.2.out" -> s"$dir/out/big",
      "state.dir" -> s"$dir/state"))
    val r = PipelineRunner.run(spark, spec, "lrun1")
    assert(r.lineage.size == 2)

    val edges = Lineage.edges(new EventStore(spark, s"$dir/state/events").table)
    val rows = edges.select("dataset", "source_platform", "source_name",
        "destination_platform", "destination_name")
      .as[(String, String, String, String, String)].collect().toSet
    assert(rows == Set(
      ("lineage-job", "parquet", s"$dir/in", "parquet", s"$dir/out/all"),
      ("lineage-job", "parquet", s"$dir/in", "parquet", s"$dir/out/big")))

    // a second run appends its own flush file; edges accumulate per run
    PipelineRunner.run(spark, spec, "lrun2")
    assert(Lineage.edges(new EventStore(spark, s"$dir/state/events").table)
      .count() == 4)
  }

  test("partial commit: a failed branch emits no lineage edge") {
    val dir = tmpDir("lineage-partial")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(s"$dir/in")
    // branch 'bad' casts v to an array -> analysis failure at stage time
    val spec = PipelineSpec.fromProperties(Map(
      "job.name" -> "lineage-partial",
      "source.format" -> "parquet",
      "source.path" -> s"$dir/in",
      "job.commit.policy" -> "successful",
      "fork.1.name" -> "good",
      "fork.1.out" -> s"$dir/out/good",
      "fork.2.name" -> "bad",
      "fork.2.filter" -> "no_such_column > 0",
      "fork.2.out" -> s"$dir/out/bad",
      "state.dir" -> s"$dir/state"))
    val r = PipelineRunner.run(spark, spec, "prun1")
    assert(r.failedBranches.keySet == Set("bad"))
    val dests = r.lineage.map(_.metadata("destination.name"))
    assert(dests == Seq(s"$dir/out/good"),
      s"only the published branch may appear in lineage, got $dests")
  }
}
