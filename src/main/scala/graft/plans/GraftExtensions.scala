package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.{DotProduct, Grok, GrokStruct, GzipCompress,
  GzipDecompress, MinHashBandHashes, MinHashSignature, SrpSignatures}

/** SQL-registry face of the engine's custom Catalyst expressions — the
  * reference's class-name plug-in surface (§2.9; `converter.classes`,
  * ClassAliasResolver) re-expressed the Spark way: register once, then
  * every `spark.sql(...)` string, `selectExpr`, declarative
  * `PipelineSpec.transformExprs` entry, and downstream BI tool can call
  * the operators by name with no Scala imports.
  *
  * Two activation paths, same registrations:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (constructor injection at session build — the
  *    SparkSessionExtensions mechanism);
  *  - live session: `GraftExtensions.register(spark)` (idempotent).
  *
  * Registered functions (arguments after the column must be literals —
  * they parameterize codegen'd expression trees, not per-row values):
  *
  *  - `graft_gzip(bin)` / `graft_gunzip(bin)`
  *  - `graft_minhash(text, n, k)` — k minhash values over word n-grams
  *  - `graft_minhash_bands(text, n, k, bands)` — banded LSH bucket keys
  *  - `graft_srp(vec, bits, tables)` — signed-random-projection sigs
  *  - `graft_grok(line, pattern)` — one-match grok struct (named fields)
  *  - `graft_zvalue(rank1, ..., rankN, bits)` — Morton z-curve value
  *  - `graft_vec_dot(a, b)` — fused dot product of two array<double>
  *
  * (Column-composition operators like `TextStats.maxTokenRun` are NOT
  * registrable here — a function builder must return a Catalyst
  * Expression, and Spark 4's Column is a column node that stays
  * unresolved inside a registry builder; those ship through the
  * declarative transform dialect instead, e.g. `maxrun:`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litString(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** (name, info, builder) for every exposed function. */
  val registrations: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_gzip", info("graft_gzip", "graft_gzip(bin) - gzip-compress a binary column"),
      args => { arity("graft_gzip", args, 1); GzipCompress(args.head) }),
    ("graft_gunzip", info("graft_gunzip", "graft_gunzip(bin) - gunzip a binary column"),
      args => { arity("graft_gunzip", args, 1); GzipDecompress(args.head) }),
    ("graft_minhash", info("graft_minhash",
      "graft_minhash(text, n, k) - k minhash values over word n-grams"),
      args => { arity("graft_minhash", args, 3)
        MinHashSignature(args.head,
          litInt(args(1), "graft_minhash", "n"),
          litInt(args(2), "graft_minhash", "k")) }),
    ("graft_minhash_bands", info("graft_minhash_bands",
      "graft_minhash_bands(text, n, k, bands) - banded LSH bucket keys"),
      args => { arity("graft_minhash_bands", args, 4)
        MinHashBandHashes(args.head,
          litInt(args(1), "graft_minhash_bands", "n"),
          litInt(args(2), "graft_minhash_bands", "k"),
          litInt(args(3), "graft_minhash_bands", "bands")) }),
    ("graft_srp", info("graft_srp",
      "graft_srp(vec, bits, tables) - signed-random-projection signatures"),
      args => { arity("graft_srp", args, 3)
        SrpSignatures(args.head,
          litInt(args(1), "graft_srp", "bits"),
          litInt(args(2), "graft_srp", "tables")) }),
    ("graft_grok", info("graft_grok",
      "graft_grok(line, pattern) - single-match grok parse to a named struct"),
      args => { arity("graft_grok", args, 2)
        val compiled = Grok.compile(
          litString(args(1), "graft_grok", "pattern"))
        GrokStruct(args.head, compiled.regex,
          compiled.fields.map(_.name), compiled.fields.map(_.group)) }),
    ("graft_zvalue", info("graft_zvalue",
      "graft_zvalue(rank1, ..., rankN, bits) - Morton z-curve interleave of long ranks"),
      args => {
        if (args.length < 2) throw new IllegalArgumentException(
          s"graft_zvalue expects at least 2 arguments, got ${args.length}")
        graft.functions.ZInterleave(args.init,
          litInt(args.last, "graft_zvalue", "bits")) }),
    ("graft_vec_dot", info("graft_vec_dot",
      "graft_vec_dot(a, b) - fused single-loop dot product of two array<double>"),
      args => { arity("graft_vec_dot", args, 2)
        DotProduct(args.head, args(1)) }))

  /** Register into a LIVE session's function registry (idempotent —
    * re-registration replaces the same name). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
