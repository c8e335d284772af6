package graft

/** Shared JSON string escaper for the harness entry points (Verify's
  * oracle dump, Bench's result line): backslash, quote, and ALL
  * control chars below 0x20 — a stray tab or CR in builder-authored
  * SQL or an exception message would otherwise break the driver's
  * `json.load` and silently zero a round's artifact. One copy so an
  * escaping fix can never drift between the two harnesses. */
private[graft] object JsonUtil {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
