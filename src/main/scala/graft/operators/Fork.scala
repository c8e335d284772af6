package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

import graft.sinks.AtomicPublisher
import graft.sinks.AtomicPublisher.WriteSpec

/** Fork: route/duplicate one input stream into N independently
  * transformed + checked + written branches.
  *
  * Reference: ForkOperator (gobblin-api/.../fork/ForkOperator.java:36,52,
  * 61,70) returns a per-record Boolean routing vector; Forker splits the
  * record stream into per-branch bounded queues
  * (StreamModelTaskRunner.java:140-155).
  *
  * Spark-first: the routing vector becomes per-branch filter predicates;
  * the shared input is persisted ONCE and each branch is an independent
  * write action over it. The reference's bounded queues / copy-on-fork
  * disappear — Rows are immutable and Spark schedules the branch jobs over
  * the same cached scan. At 100 TB prefer StorageLevel.DISK_ONLY or
  * recompute (no persist) when branch predicates are selective enough that
  * two scans beat caching.
  */
object Fork {

  final case class Branch(name: String,
                          predicate: Option[Column] = None, // None = all records
                          transform: DataFrame => DataFrame = identity,
                          outDir: String,
                          spec: WriteSpec = WriteSpec())

  /** Materialize every branch; returns per-branch row counts. */
  def run(df: DataFrame, branches: Seq[Branch], runId: String,
          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): Map[String, Long] = {
    val shared = if (branches.size > 1) df.persist(storage) else df
    try {
      branches.map { b =>
        val routed = b.predicate.fold(shared)(shared.filter)
        val out = b.transform(routed)
        AtomicPublisher.publish(out, b.outDir, runId, b.spec)
        val written = out.sparkSession.read.format(b.spec.format).load(b.outDir)
        b.name -> written.count()
      }.toMap
    } finally if (branches.size > 1) { shared.unpersist(); () }
  }

  /** Plan-only fork (no writes): per-branch DataFrames over a shared scan. */
  def plan(df: DataFrame, branches: Seq[Branch]): Map[String, DataFrame] =
    branches.map(b => b.name -> b.transform(b.predicate.fold(df)(df.filter))).toMap
}
