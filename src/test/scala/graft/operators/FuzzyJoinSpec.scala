package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("blocked join equals all-pairs levenshtein within the block contract") {
    val names = Tables.load(spark, sf, "part").select("p_name")
    val mutated = names.distinct()
      .select(expr("substring(p_name, 1, length(p_name) - 1)").as("mut"))
    val got = FuzzyJoin.join(names, mutated, "p_name", "mut", 2, 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // reference: all-pairs restricted to the same blocking key
    val ns = names.distinct().as[String].collect()
    val ms = mutated.distinct().as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- ns; b <- ms
      if a.take(4) == b.take(4) && lev(a, b) <= 2
    } yield (a, b)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("exact self-match always survives (distance 0)") {
    val names = Seq("alpha beta", "gamma delta").toDF("n")
    val got = FuzzyJoin.join(names, names.withColumnRenamed("n", "m"),
      "n", "m", maxDist = 0, blockLen = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == Set(("alpha beta", "alpha beta", 0L),
      ("gamma delta", "gamma delta", 0L)))
  }

  test("degenerate block key is refused loudly") {
    val same = (1 to 50).map(i => s"prefix-common-$i").toDF("n")
    val e = intercept[Exception] {
      FuzzyJoin.join(same, same.withColumnRenamed("n", "m"),
        "n", "m", maxDist = 1, blockLen = 6, maxBlockRows = 10).count()
    }
    assert(e.getMessage.contains("not selective"))
  }

  test("a hot block on the RIGHT side alone is also refused") {
    // left has one row per block; right piles 50 rows into one block —
    // the pre-round-10 guard audited only the left side and let this
    // near-all-pairs join run silently
    val l = Seq("prefix-a").toDF("n")
    val r = (1 to 50).map(i => s"prefix-$i").toDF("m")
    val e = intercept[Exception] {
      FuzzyJoin.join(l, r, "n", "m", maxDist = 2, blockLen = 6,
        maxBlockRows = 10).count()
    }
    assert(e.getMessage.contains("not selective"))
  }
}
