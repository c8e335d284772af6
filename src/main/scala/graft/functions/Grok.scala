package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Grok pattern compiler: `%{NAME:field}` / `%{NAME:field:type}` macros
  * over a library of named regex fragments, compiled to one Java regex
  * with positional capture groups and applied as typed columns.
  *
  * Reference: GrokToJsonConverter
  * (gobblin-modules/gobblin-grok/.../GrokToJsonConverter.java:86) compiles
  * the configured grok expression once and converts each matched line into
  * a JSON record, with nullable-field checking.
  *
  * Semantics match grok: text between macros is raw regex; library
  * entries may reference other entries (expanded to a fixed depth);
  * unnamed macros (`%{NAME}`) match without capturing; a third macro part
  * declares the output type (int/long/float/double/boolean — grok's type
  * coercion). Unmatched lines yield NULL fields (the reference emits
  * nulls and lets a row policy reject them).
  *
  * Scale: compilation is driver-side; extraction is ONE compiled regex
  * and ONE match per row via [[GrokStruct]] — all k typed fields read
  * from the same Matcher, like the reference's single convertRecord
  * match, never k regex executions. Keep GREEDYDATA fields last to avoid
  * backtracking blowups, exactly as with any grok engine.
  */
object Grok {

  /** Library of self-contained fragments (non-capturing groups ONLY —
    * field captures are added by the compiler). A practical subset of the
    * standard grok base patterns. */
  val defaultPatterns: Map[String, String] = Map(
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?(?:[0-9]+)",
    "BASE10NUM" -> "[+-]?(?:[0-9]+(?:\\.[0-9]+)?|\\.[0-9]+)",
    "NUMBER" -> "%{BASE10NUM}",
    "POSINT" -> "\\b[1-9][0-9]*\\b",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
    "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:[0-5][0-9])(?:[:.,][0-9]+)?",
    "TIME" -> "%{HOUR}:%{MINUTE}:%{SECOND}",
    "DATE_ISO" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}",
    "TIMESTAMP_ISO8601" ->
      "%{DATE_ISO}[T ]%{HOUR}:%{MINUTE}(?::%{SECOND})?(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)?",
    "IPV4" ->
      "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "LOGLEVEL" ->
      "(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|SEVERE|CRITICAL|FATAL)",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}")

  private val macroRe = """%\{(\w+)(?::([\w.\[\]@-]+))?(?::(\w+))?\}""".r

  /** One named capture: field name, 1-based regex group, declared type. */
  final case class Field(name: String, group: Int, castTo: Option[String])

  final case class Compiled(regex: String, fields: Seq[Field])

  /** Expand every macro; named macros become capturing groups in order of
    * appearance, unnamed ones non-capturing. */
  def compile(pattern: String,
              library: Map[String, String] = defaultPatterns): Compiled = {
    // expand library references inside library bodies (non-capturing)
    def expandBody(body: String, depth: Int): String = {
      require(depth < 10, s"grok pattern nesting too deep: $body")
      macroRe.replaceAllIn(body, m => {
        val sub = library.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
        java.util.regex.Matcher.quoteReplacement(
          "(?:" + expandBody(sub, depth + 1) + ")")
      })
    }
    // capturing groups the USER wrote in raw-regex segments shift the
    // group numbering, so count them while walking the pattern (library
    // bodies are non-capturing by contract)
    def countCaptures(s: String): Int = {
      var n = 0
      var i = 0
      // '(' inside [...] is a literal, not a group; Java classes NEST
      // ([a[bc]] is a union), so track depth, not a boolean
      var classDepth = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length && s.charAt(i + 1) == 'Q' =>
            // \Q...\E quotes everything inside — skip to the \E
            val e = s.indexOf("\\E", i + 2)
            i = if (e < 0) s.length else e + 1
          case '\\' => i += 1 // skip escaped char
          case '[' => classDepth += 1
          case ']' if classDepth > 0 => classDepth -= 1
          case '(' if classDepth == 0 =>
            if (i + 1 >= s.length || s.charAt(i + 1) != '?') n += 1
            // (?<name>...) is a CAPTURING named group (unlike (?:, (?=,
            // (?<=, (?<! ...), so it shifts the numbering too
            else if (i + 3 < s.length && s.charAt(i + 2) == '<' &&
                     s.charAt(i + 3) != '=' && s.charAt(i + 3) != '!') n += 1
          case _ =>
        }
        i += 1
      }
      n
    }
    var group = 0
    val fields = scala.collection.mutable.ListBuffer.empty[Field]
    val out = new StringBuilder
    var last = 0
    macroRe.findAllMatchIn(pattern).foreach { m =>
      val literal = pattern.substring(last, m.start)
      group += countCaptures(literal)
      out ++= literal
      val body = expandBody(
        library.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}")),
        0)
      Option(m.group(2)) match {
        case Some(fieldName) =>
          group += 1
          fields += Field(fieldName, group, Option(m.group(3)))
          out ++= "(" + body + ")"
        case None => out ++= "(?:" + body + ")"
      }
      last = m.end
    }
    out ++= pattern.substring(last)
    Compiled(out.toString, fields.toSeq)
  }

  private def cast(c: Column, t: Option[String]): Column = t match {
    case Some("int")                 => c.cast("int")
    case Some("long")                => c.cast("bigint")
    case Some("float")               => c.cast("float")
    case Some("double")              => c.cast("double")
    case Some("boolean" | "bool")    => c.cast("boolean")
    case Some(other) =>
      throw new IllegalArgumentException(s"unsupported grok type: $other")
    case None => c
  }

  /** The all-groups struct column (one regex match per row) plus the
    * compiled field list. */
  def structColumn(src: Column, pattern: String,
                   library: Map[String, String] = defaultPatterns)
      : (Column, Seq[Field]) = {
    val c = compile(pattern, library)
    val e = GrokStruct(GraftColumnShim.expression(src), c.regex,
      c.fields.map(_.name), c.fields.map(_.group))
    (GraftColumnShim.column(e), c.fields)
  }

  /** Typed columns for every named field in the pattern; NULL when the
    * line does not match. Each column is a struct-field read of the same
    * [[GrokStruct]] subtree, so a projection selecting several of them
    * still runs the regex once per row (equal deterministic subtrees are
    * subexpression-eliminated); [[parse]] pins single evaluation
    * structurally and is the preferred converter form. */
  def columns(src: Column, pattern: String,
              library: Map[String, String] = defaultPatterns): Seq[(String, Column)] = {
    val (sc, fields) = structColumn(src, pattern, library)
    fields.map(f => f.name -> cast(sc.getField(f.name), f.castTo))
  }

  /** Converter form: df plus one column per grok field. The struct lands
    * in its own projection; CollapseProject never inlines a
    * multiply-referenced non-cheap expression, so the regex runs ONCE per
    * row however many fields the pattern declares. */
  def parse(df: DataFrame, srcCol: String, pattern: String,
            library: Map[String, String] = defaultPatterns): DataFrame = {
    val (sc, fields) = structColumn(col(srcCol), pattern, library)
    val tmpCol = s"__grok_$srcCol"
    fields.foldLeft(df.withColumn(tmpCol, sc)) { case (d, f) =>
      d.withColumn(f.name, cast(col(tmpCol).getField(f.name), f.castTo))
    }.drop(tmpCol)
  }
}

/** One compiled regex, ONE `find()` per row, every named grok field read
  * from the same match into a struct of strings.
  *
  * Matches the reference's convertRecord, which matches the compiled grok
  * once and walks its named groups (GrokToJsonConverter.java:86) — k
  * fields never cost k regex executions. Parity with the regexp_extract
  * semantics this replaces: NULL struct when the line has no match; a
  * matched line's non-participating optional group yields "". */
case class GrokStruct(child: Expression, regex: String,
                      fieldNames: Seq[String], groups: Seq[Int])
    extends UnaryExpression with CodegenFallback {
  require(fieldNames.length == groups.length)
  override def dataType: DataType =
    StructType(fieldNames.map(n => StructField(n, StringType)))
  override def prettyName: String = "grok_struct"
  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)
  override protected def nullSafeEval(input: Any): Any = {
    val m = pattern.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val out = new Array[Any](groups.length)
      var i = 0
      while (i < groups.length) {
        val g = m.group(groups(i))
        out(i) = if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(out)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): GrokStruct =
    copy(child = newChild)
}
