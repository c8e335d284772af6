package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

import graft.functions.Codecs
import graft.operators.SchemaEvolution
import graft.text.TextStats

/** Property-based round-trips (SURVEY §5): scalacheck generators with a
  * fixed seed (deterministic CI), values batched into one DataFrame per
  * property so Spark runs once per law, not once per case. */
class PropertyRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("gen failed"))

  test("gzip |> gunzip is identity for arbitrary unicode strings") {
    val xs = samples(Arbitrary.arbitrary[String], 300)
    val df = xs.zipWithIndex.map(_.swap).toDF("id", "s")
    val bad = df
      .withColumn("rt",
        decode(Codecs.gunzip(Codecs.gzip(encode(col("s"), "UTF-8"))), "UTF-8"))
      .filter(!(col("rt") <=> col("s")))
    assert(bad.isEmpty, s"gzip round-trip broke on: ${bad.take(3).mkString}")
  }

  test("aes encrypt |> decrypt is identity; ciphertext differs from input") {
    val key = "0123456789abcdef" // 16-byte AES key
    val xs = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 200)
    val df = xs.distinct.toDF("s")
    val out = df.select(col("s"),
      Codecs.aesDecrypt(Codecs.aesEncrypt(col("s"), key), key).as("rt"),
      Codecs.aesEncrypt(col("s"), key).cast("string").as("ct"))
    assert(out.filter(!(col("rt") <=> col("s"))).isEmpty)
    assert(out.filter(col("ct") === col("s")).isEmpty)
  }

  test("portableHash60 stays within [0, 2^60) and is deterministic") {
    val xs = samples(Arbitrary.arbitrary[String], 300)
    val df = xs.zipWithIndex.map(_.swap).toDF("id", "s")
    val h = df.select(TextStats.portableHash60(col("s")).as("h"),
      TextStats.portableHash60(col("s")).as("h2"))
    assert(h.filter(col("h") < 0 || col("h") >= lit(1L << 60)).isEmpty)
    assert(h.filter(col("h") =!= col("h2")).isEmpty)
  }

  test("evolve preserves values under arbitrary widening (int->long->double)") {
    val rows = samples(
      for {
        a <- Arbitrary.arbitrary[Int]
        b <- Arbitrary.arbitrary[Long]
        s <- Gen.alphaNumStr
      } yield (a, b, s), 300)
    val df = rows.toDF("a", "b", "s")
    val target = StructType(Seq(
      StructField("s", StringType, nullable = true),
      StructField("a", DoubleType, nullable = true),
      StructField("b", LongType, nullable = true),
      StructField("extra", StringType, nullable = true)))
    val out = SchemaEvolution.evolve(df, target)
    assert(out.columns.toSeq == Seq("s", "a", "b", "extra"))
    val back = out.select(col("a").cast("int"), col("b"), col("s"))
      .as[(Int, Long, String)].collect().toSet
    assert(back == rows.toSet) // ints survive the double widening exactly
    assert(out.filter(col("extra").isNotNull).isEmpty)
  }
}
