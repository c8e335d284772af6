package graft.planning

import scala.collection.mutable

/** Work-unit bin packing: group weighted items (files, topic partitions,
  * copy entities) into work units so parallel tasks finish together.
  *
  * Reference: the reference sizes work units by estimated weight and packs
  * them two ways — balance into a FIXED number of units
  * (KafkaWorkUnitPacker's worst-fit-decreasing over avg-record-size
  * weights, gobblin-modules/gobblin-kafka-common/.../workunit/packer/
  * KafkaWorkUnitPacker.java) or split under a SIZE CAP
  * (WorstFitDecreasingBinPacking in gobblin-utility). Spark's own task
  * planning (maxPartitionBytes) covers file scans; this planner is for
  * driver-side work lists the scan planner never sees — copy plans,
  * JDBC chunk groups, per-dataset compaction jobs.
  *
  * Deterministic: ties break on item id, so the same inputs always pack
  * identically (plans are reproducible across retries).
  */
object BinPacker {

  final case class Item(id: String, weight: Long)
  final case class Bin(items: Vector[Item]) {
    def weight: Long = items.map(_.weight).sum
    def ids: Vector[String] = items.map(_.id)
  }

  /** Worst-fit-decreasing into EXACTLY `numBins` bins (balance objective):
    * sort items by weight descending, always place into the currently
    * lightest bin. Max bin weight is within (largest item) of optimal for
    * typical work-unit shapes. */
  def packBalanced(items: Seq[Item], numBins: Int): Seq[Bin] = {
    require(numBins > 0, "numBins must be positive")
    val bins = Array.fill(numBins)(Vector.empty[Item])
    val weights = Array.fill(numBins)(0L)
    // deterministic order: heaviest first, id tie-break
    items.sortBy(i => (-i.weight, i.id)).foreach { it =>
      var best = 0
      var b = 1
      while (b < numBins) {
        if (weights(b) < weights(best)) best = b
        b += 1
      }
      bins(best) :+= it
      weights(best) += it.weight
    }
    bins.toSeq.map(Bin)
  }

  /** First-fit-decreasing under a per-bin capacity: as few bins as FFD
    * yields, none above `capacity` (an item heavier than the capacity gets
    * its own bin — it cannot be split here; split oversized items upstream,
    * e.g. via [[WatermarkPartitioner]] range chunks). */
  def packCapped(items: Seq[Item], capacity: Long): Seq[Bin] = {
    require(capacity > 0, "capacity must be positive")
    val bins = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Item]]
    val weights = mutable.ArrayBuffer.empty[Long]
    items.sortBy(i => (-i.weight, i.id)).foreach { it =>
      val fit = weights.indices.find(b => weights(b) + it.weight <= capacity)
      fit match {
        case Some(b) => bins(b) += it; weights(b) += it.weight
        case None    => bins += mutable.ArrayBuffer(it); weights += it.weight
      }
    }
    bins.toSeq.map(b => Bin(b.toVector))
  }
}
