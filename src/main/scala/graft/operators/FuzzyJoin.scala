package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy join with prefix blocking — the entity-resolution
  * primitive (matching names/titles/addresses across sources when keys
  * don't line up). All-pairs × levenshtein is O(n·m) and never runs at
  * scale; blocking turns it into an equi-join on a cheap stable key
  * (here: the first `blockLen` characters) with the edit-distance
  * verify confined to each block — the standard ER blocking design.
  *
  * CONTRACT: blocking bounds recall — a true match whose edits touch
  * the first `blockLen` characters lands in different blocks and is
  * missed. That is the classic precision/recall dial of blocked ER
  * (pick a key the corruption you hunt for doesn't touch); this
  * operator never trades silently — the guard below refuses block
  * keys so hot the "blocked" join degenerates toward all-pairs.
  */
object FuzzyJoin {

  /** Pairs (leftCol, rightCol, dist) with levenshtein ≤ maxDist and a
    * shared `blockLen`-char prefix. Inputs should be deduplicated
    * dictionaries (match NAMES, then join rows by name — never fuzzy
    * match row pairs directly). */
  def join(left: DataFrame, right: DataFrame, leftCol: String,
           rightCol: String, maxDist: Int, blockLen: Int,
           maxBlockRows: Long = 100000L): DataFrame = {
    require(maxDist >= 0 && blockLen > 0)
    val l = left.select(col(leftCol)).filter(col(leftCol).isNotNull)
      .distinct()
      .withColumn("__graft_blk", substring(col(leftCol), 1, blockLen))
    val r = right.select(col(rightCol)).filter(col(rightCol).isNotNull)
      .distinct()
      .withColumn("__graft_blk", substring(col(rightCol), 1, blockLen))
    // loud degeneracy guard: the hottest block must stay bounded, or
    // the equi-join is all-pairs wearing a costume
    val worst = l.groupBy("__graft_blk").agg(count(lit(1)).as("c"))
      .agg(max("c")).collect()(0).getLong(0)
    require(worst <= maxBlockRows,
      s"hottest block has $worst rows (max $maxBlockRows): blockLen=" +
        s"$blockLen is not selective on this data — lengthen the key")
    l.join(r, "__graft_blk")
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("dist") <= maxDist)
      .select(col(leftCol), col(rightCol), col("dist").cast("bigint").as("dist"))
  }
}
