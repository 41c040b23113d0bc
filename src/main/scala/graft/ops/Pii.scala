package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over untrusted web text — the scrub pass a
  * training-data pipeline runs before anything leaves the raw crawl zone.
  *
  * Patterns are restricted to the construct subset Java regex and RE2
  * match identically (character classes, bounded repetition, `\b` on the
  * shared `[A-Za-z0-9_]` word class — no lookaround, no backreferences),
  * the same discipline as [[TextAnalysis.BpePattern]], so the DuckDB
  * oracle can run the literal same patterns.
  *
  * Everything is per-row column arithmetic (codegen'd `regexp_extract_all`
  * / `regexp_replace` — no UDF, no shuffle): the pass runs at scan speed
  * over 100 TB and composes with any downstream operator.
  */
object Pii {

  /** Email: local part @ dotted domain with an alphabetic TLD of ≥ 2.
    * Case-insensitive via explicit [A-Za-z] classes (NOT by lowercasing
    * the input — that would corrupt the md5 witness of non-PII text, and
    * inline `(?i)` flags are a construct the two engines treat
    * differently in mid-pattern position).
    */
  val EmailRe: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Dotted-quad IPv4 (syntactic — no octet range check, matching the
    * recall-over-precision choice real scrubbers make).
    */
  val Ipv4Re: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** NANP-style dashed phone number. */
  val PhoneRe: String = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  private def countOf(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Redacted text: emails, then IPv4s, then phones replaced by typed
    * placeholders. Order matters only in that placeholders must not be
    * re-matchable by a later pattern (they are not: no digits/@ inside).
    */
  def redactedCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-doc PII counts plus an md5 witness of the redacted text (the
    * hash keeps the gate/byte contract without shipping the text twice).
    */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      countOf(col(textCol), EmailRe).as("n_emails"),
      countOf(col(textCol), Ipv4Re).as("n_ips"),
      countOf(col(textCol), PhoneRe).as("n_phones"),
      md5(redactedCol(col(textCol))).as("clean_hash"))
}
