package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Scale: compilation is driver-side; extraction is codegen'd
  * `regexp_extract` per field — k fields cost k regex runs per row, fine
  * for log shapes (k small); keep GREEDYDATA fields last to avoid
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

  /** Typed columns for every named field in the pattern; NULL when the
    * line does not match. */
  def columns(src: Column, pattern: String,
              library: Map[String, String] = defaultPatterns): Seq[(String, Column)] = {
    val c = compile(pattern, library)
    val matches = src.rlike(c.regex)
    c.fields.map { f =>
      f.name -> cast(
        when(matches, regexp_extract(src, c.regex, f.group)).otherwise(lit(null)),
        f.castTo)
    }
  }

  /** Converter form: df plus one column per grok field. */
  def parse(df: DataFrame, srcCol: String, pattern: String,
            library: Map[String, String] = defaultPatterns): DataFrame =
    columns(col(srcCol), pattern, library).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
}
