package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: 64-bit signature whose Hamming
  * distance approximates cosine distance over the token multiset.
  *
  * signature bit j = sign( Σ_tokens (bit j of xxhash64(token) ? +1 : -1) )
  *
  * Implemented as pure column expressions: per document we fold the token
  * array into a 64-wide vote vector and collapse to a long — a map-only
  * pass, no shuffle, no UDF (stays in codegen). Near-dup detection then
  * groups by signature (exact) or by signature bands (Hamming ≤ d).
  */
object SimHash {

  /** 64-bit simhash of a whitespace-tokenized text column. */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    // votes[j] = sum over tokens of +-1 by bit j of the token hash
    val votes = aggregate(
      transform(toks, t => xxhash64(t)),
      array((0 until 64).map(_ => lit(0L)): _*),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))),
        (a, v) => a + v))
    // collapse sign bits into one long
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  def withSimhash(df: DataFrame, textCol: String,
                  as: String = "simhash"): DataFrame =
    df.withColumn(as, simhash(col(textCol)))

  /** Candidate near-dup pairs with Hamming distance <= maxDist, using the
    * pigeonhole banding trick: split 64 bits into (maxDist+1) bands — two
    * docs within maxDist must agree exactly on at least one band, so the
    * join key space is tiny and the self-join never goes quadratic. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    val width = 64 / nBands
    val sig = df.select(col(idCol), simhash(col(textCol)).as("sig"))
    val banded = sig.select(col(idCol), col("sig"), posexplode(
      transform(sequence(lit(0), lit(nBands - 1)),
        b => call_function("shiftright", col("sig"), b * lit(width))
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("band_idx", "band_key")))
    val l = banded.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming").distinct()
  }
}
