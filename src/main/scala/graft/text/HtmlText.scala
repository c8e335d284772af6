package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML → text extraction — the first transform every web-crawl
  * document passes through before the text stack (quality, language
  * ID, dedup) sees it. Deterministic single-pass rules, no DOM
  * library: `script`/`style`/`noscript`/`template` elements and
  * comments are dropped WITH their contents, every other tag becomes
  * a word break (block-ish tags a newline), basic entities decode
  * (`&amp; &lt; &gt; &quot; &apos; &nbsp; &#NN; &#xHH;`), and
  * whitespace collapses (runs of spaces to one, 3+ newlines to 2 —
  * the C4/CCNet convention). A `<title>` extractor serves metadata
  * columns. Malformed markup never throws: an unclosed tag swallows
  * to EOF exactly like browsers' error recovery, so a truncated crawl
  * page degrades instead of failing the partition.
  */
object HtmlText {

  private val DropElems =
    Set("script", "style", "noscript", "template", "title")
  private val BlockElems = Set("p", "div", "br", "li", "ul", "ol", "h1",
    "h2", "h3", "h4", "h5", "h6", "tr", "table", "blockquote", "pre",
    "section", "article", "header", "footer", "hr")

  /** Extract readable text from an HTML string. */
  def extract(html: String): String = {
    if (html == null) return ""
    val out = new java.lang.StringBuilder(html.length / 2)
    val lower = html.toLowerCase
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) i = n // unclosed tag swallows to EOF
          else {
            val inner = html.substring(i + 1, close).trim
            val name = inner.takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            if (DropElems(name) && !inner.startsWith("/") &&
              !inner.endsWith("/")) {
              // skip to the matching close tag, contents included
              val endTag = s"</$name"
              val idx = lower.indexOf(endTag, close + 1)
              if (idx < 0) i = n
              else {
                val gt = html.indexOf('>', idx)
                i = if (gt < 0) n else gt + 1
              }
            } else {
              val tag = if (inner.startsWith("/")) inner.drop(1)
                .takeWhile(_.isLetterOrDigit).toLowerCase else name
              out.append(if (BlockElems(tag)) '\n' else ' ')
              i = close + 1
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > 0 && semi - i <= 10) {
          val ent = html.substring(i + 1, semi)
          val decoded = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try String.valueOf(Integer.parseInt(e.drop(2), 16).toChar)
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try String.valueOf(Integer.parseInt(e.drop(1)).toChar)
              catch { case _: Exception => null }
            case _ => null
          }
          if (decoded != null) { out.append(decoded); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    collapse(out.toString)
  }

  /** The `<title>` contents, entity-decoded; empty when absent. */
  def title(html: String): String = {
    if (html == null) return ""
    val lower = html.toLowerCase
    val open = lower.indexOf("<title")
    if (open < 0) return ""
    val gt = html.indexOf('>', open)
    if (gt < 0) return ""
    val close = lower.indexOf("</title", gt)
    if (close < 0) return ""
    extract(html.substring(gt + 1, close)).trim
  }

  /** Whitespace normalization: runs of spaces/tabs to one space,
    * spaces around newlines dropped, 3+ newlines to 2, trimmed. */
  private def collapse(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var pendingNl = 0
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { pendingNl += 1; pendingSpace = false }
      else if (c.isWhitespace) pendingSpace = true
      else {
        if (started) {
          if (pendingNl >= 2) out.append("\n\n"): Unit
          else if (pendingNl == 1) out.append('\n'): Unit
          else if (pendingSpace) out.append(' '): Unit
        }
        pendingNl = 0
        pendingSpace = false
        out.append(c): Unit
        started = true
      }
      i += 1
    }
    out.toString
  }

  /** Column faces (the crawl pipeline's map pass). */
  private val extractUdf = udf((s: String) => extract(s))
  private val titleUdf = udf((s: String) => title(s))
  def htmlToText(c: Column): Column = extractUdf(c)
  def htmlTitle(c: Column): Column = titleUdf(c)
}
