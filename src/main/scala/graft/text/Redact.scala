package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: replace emails, IPv4
  * addresses, and phone numbers with typed placeholder tokens, and count
  * what was removed (per-doc audit columns, so a downstream quality gate
  * can drop documents that are mostly PII).
  *
  * All transforms are single codegen'd `regexp_replace` /
  * `regexp_extract_all` expressions — map-only, no shuffle, no UDF — so
  * the pass costs one scan at any corpus size. Patterns are kept to the
  * RE2-compatible subset (no backreferences/lookahead) so the same regex
  * runs in the DuckDB oracle verbatim.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // leading \+? sits OUTSIDE the word boundary: "+" is a non-word char, so
  // "\b\+" can never match after a space (and RE2 — the oracle engine —
  // has no lookbehind to anchor it differently)
  val PhoneRe = "\\+?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Order matters: emails first (their local part may contain digits and
    * dots that the looser patterns would mangle), then IPs, then phones. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
}
