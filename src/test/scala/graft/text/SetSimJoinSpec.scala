package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame,
                         p: Int): Set[(Long, Long, Long, Long)] = {
    val sets = df.select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).filter(_.nonEmpty).toSet)
    (for {
      (ia, ta) <- sets; (ib, tb) <- sets if ia < ib
      inter = (ta & tb).size.toLong
      uni = ta.size + tb.size - inter
      if inter * 1000 >= uni * p
    } yield (ia, ib, inter, uni)).toSet
  }

  test("prefix-filtered join equals brute force on real documents") {
    // t = 0.90 widens the answer set well beyond q154's, stressing the
    // prefix length math and the length filter
    val docs = Tables.load(spark, sf, "documents")
    val got = SetSimJoin.selfJoin(docs, "doc_id", "text", 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == bruteForce(docs, 900))
    assert(got.nonEmpty, "the vocabulary overlap must produce pairs")
  }

  test("no false negatives: a planted J=t boundary pair is found") {
    // A = 19 shared + 1 own, B = 19 shared + 1 own: J = 18/… build
    // exactly J = 0.9: |A∩B| = 18, |A∪B| = 20
    val shared = (1 to 18).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared a1"), // 19 tokens
      (2L, s"$shared b1")  // 19 tokens; inter 18, uni 20 → J = 0.9
    ).toDF("doc_id", "text")
    val got = SetSimJoin.selfJoin(df, "doc_id", "text", 900).collect()
    assert(got.length == 1)
    assert(got(0).getLong(2) == 18L && got(0).getLong(3) == 20L)
    // and at 901 permille the same pair is correctly excluded
    assert(SetSimJoin.selfJoin(df, "doc_id", "text", 901).isEmpty)
  }

  test("hot tokens ride in suffixes: stopword-heavy pairs stay cheap") {
    // every doc shares the hot token; prefixes must prefer the rare ones
    val df = (1L to 40L).map(i => (i, s"the unique$i other$i"))
      .toDF("doc_id", "text")
    val prefixJoin = SetSimJoin.selfJoin(df, "doc_id", "text", 900)
    assert(prefixJoin.isEmpty, "no pair reaches J ≥ 0.9")
    // threshold guard
    intercept[IllegalArgumentException] {
      SetSimJoin.selfJoin(df, "doc_id", "text", 0)
    }
  }
}
