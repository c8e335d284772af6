package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextStats

/** SimHash near-duplicate fingerprinting: 60-bit signature whose Hamming
  * distance approximates cosine distance over the token multiset.
  *
  * signature bit j = sign( Σ_tokens (bit j of hash(token) ? +1 : -1) )
  *
  * The token hash is [[TextStats.portableHash60]] (md5-derived) so the
  * whole signature is reproducible in any engine with md5 — which is what
  * makes the q22 oracle possible; 60 bits because that is the widest
  * hex-prefix of md5 that fits a signed bigint in both engines.
  *
  * Implemented as pure column expressions: per document we fold the token
  * array into a 60-wide vote vector and collapse to a long — a map-only
  * pass, no shuffle, no UDF (stays in codegen). Near-dup detection then
  * groups by signature (exact) or by signature bands (Hamming ≤ d).
  */
object SimHash {

  /** Signature width: bits of [[TextStats.portableHash60]]. */
  val SigBits = 60

  /** 60-bit simhash of a whitespace-tokenized text column. */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    // votes[j] = sum over tokens of +-1 by bit j of the token hash
    val votes = aggregate(
      transform(toks, t => TextStats.portableHash60(t)),
      array((0 until SigBits).map(_ => lit(0L)): _*),
      (acc, h) => transform(acc, (v, j) =>
        v + when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L))))
    // collapse sign bits into one long
    aggregate(
      zip_with(votes, sequence(lit(0), lit(SigBits - 1)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  def withSimhash(df: DataFrame, textCol: String,
                  as: String = "simhash"): DataFrame =
    df.withColumn(as, simhash(col(textCol)))

  /** Candidate near-dup pairs with Hamming distance <= maxDist, using the
    * pigeonhole banding trick: split the signature into (maxDist+1) bands —
    * two docs within maxDist must agree exactly on at least one band, so
    * the join key space is tiny and the self-join never goes quadratic. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    require(SigBits % nBands == 0, s"$SigBits bits must split into $nBands bands")
    val width = SigBits / nBands
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
