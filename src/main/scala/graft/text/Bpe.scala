package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016): learn a merge
  * table from corpus word frequencies, then encode text into subword
  * tokens — the real token counter behind shard packing ([[ShardPack]]),
  * strided chunking ([[Chunker]]) and per-source quotas, replacing the
  * whitespace/regex approximation those operators accept today.
  *
  * The reference has no subword tokenizer (its converter chain stops at
  * string/regex ops, gobblin-core's converter package); this is one of
  * the training-data operators this engine adds as first-class.
  *
  * Scale shape: training aggregates word counts DISTRIBUTED (one
  * map-side-combined groupBy), then learns merges on the driver over the
  * top-`maxWords` frequency table — O(maxWords × avgLen × numMerges),
  * independent of corpus size, exactly how production BPE vocabularies
  * are built (a bounded word-frequency table stands in for the corpus).
  * Encoding is a map-only native [[BpeEncode]] expression: the merge
  * table broadcasts inside the expression tree, each row pays its own
  * words' merge loops, and a per-partition word→tokens memo exploits the
  * Zipf distribution (most words in a partition repeat), so throughput
  * approaches a dictionary lookup on natural text. No shuffle anywhere.
  */
object Bpe {

  /** End-of-word sentinel symbol (kept distinct from any character so
    * `tok tok` and `tokt ok` encode differently, per the paper). */
  val EndOfWord = "</w>"

  /** Words longer than this bypass the merge loop and encode as ONE
    * atomic token: the loop is O(len²) worst case, so a single
    * megabyte-long base64 "word" in a crawled document would stall its
    * task for minutes — production tokenizers cap exactly like this
    * (no real vocabulary word is 256+ chars; junk that long carries no
    * subword signal worth quadratic work). */
  val MaxWordLen = 256

  /** An ordered merge table; earlier merges have higher priority. */
  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one word: start from characters + [[EndOfWord]], repeatedly
      * apply the present pair with the best (lowest) rank until none
      * applies. Deterministic; ties cannot arise (ranks are distinct). */
    def encodeWord(word: String): Array[String] = {
      if (word.length > Bpe.MaxWordLen)
        return Array(word + Bpe.EndOfWord)
      var syms = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { syms(i) = word.charAt(i).toString; i += 1 }
      syms(word.length) = EndOfWord
      var done = syms.length <= 1
      while (!done) {
        var bestRank = Int.MaxValue
        var j = 0
        while (j < syms.length - 1) {
          val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          j += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (a, b) = merges(bestRank)
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var k = 0
          while (k < syms.length) {
            if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
              out += a + b; k += 2
            } else { out += syms(k); k += 1 }
          }
          syms = out.toArray
          if (syms.length <= 1) done = true
        }
      }
      syms
    }
  }

  /** Word tokenization shared with [[Dsir]]: lower-cased alphanumeric
    * runs — identical on the driver (training/encoding) and in SQL.
    * Locale.ROOT, NOT the JVM default: a tr-TR default turns "I" into
    * dotless ı and silently breaks driver/expression parity. */
  private[text] def splitWords(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Learn `numMerges` merges from the corpus. The word-frequency table
    * is computed distributed and truncated to the `maxWords` most
    * frequent words (deterministic tiebreak on the word) before the
    * driver-side merge loop — the bounded-sample pattern every trainer
    * in this repo uses (ivfTrain, PQ, NgramLm's minCount). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    val freqs = df
      .select(explode(Dsir.wordTokens(col(textCol))).as("w"))
      // overlong junk encodes atomically anyway ([[MaxWordLen]]) — keep
      // it out of the merge-learning table too
      .filter(length(col("w")) <= MaxWordLen)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // word -> (symbol list, freq)
    var vocab: Array[(Array[String], Long)] = freqs.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val merges = IndexedSeq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: highest count, then lexicographic pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var k = 0
            while (k < syms.length) {
              if (k < syms.length - 1 && syms(k) == best._1 && syms(k + 1) == best._2) {
                out += best._1 + best._2; k += 2
              } else { out += syms(k); k += 1 }
            }
            (out.toArray, c)
          }
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Subword tokens of `text` as `array<string>` — a native expression;
    * the model rides the expression tree (broadcast with the plan). */
  def encode(text: Column, model: BpeModel): Column =
    GraftColumnShim.column(
      BpeEncode(GraftColumnShim.expression(text), model.merges))

  /** Subword token count (the [[ShardPack]]/[[Chunker]] budget input). */
  def tokenCount(text: Column, model: BpeModel): Column =
    size(encode(text, model))
}

/** Per-row BPE encode: split to words, encode each through the merge
  * table, concatenate. A bounded per-instance memo (word → tokens)
  * makes repeated words (Zipf: most of them) a hash lookup. */
case class BpeEncode(child: Expression,
                     merges: IndexedSeq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val model = Bpe.BpeModel(merges)
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[UTF8String]]()
  private val memoCap = 1 << 16

  override protected def nullSafeEval(input: Any): Any = {
    val words = Bpe.splitWords(input.asInstanceOf[UTF8String].toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var toks = memo.get(w)
      if (toks == null) {
        toks = model.encodeWord(w).map(UTF8String.fromString)
        if (memo.size < memoCap) memo.put(w, toks)
      }
      out ++= toks
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
