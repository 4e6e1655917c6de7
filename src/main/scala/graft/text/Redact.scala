package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora — the scrubbing
  * stage a data pipeline runs on the curated mix before it ships
  * (emails, phone numbers, IPv4 addresses, SSN-shaped ids). Everything
  * is a pure Column expression over codegen'd regex functions: no UDF,
  * no shuffle, scan-side at any scale.
  *
  * The patterns are deliberately written in the common subset of
  * Java's regex dialect and RE2 (no backreferences, no lookaround) so
  * the DuckDB oracle replays detection AND replacement byte-for-byte —
  * the cross-engine equality is part of the correctness surface
  * (q_pii_scan / q_pii_redact), not an aspiration. A production
  * deployment swaps in its jurisdiction's pattern set; the operator
  * shape (count columns + ordered replacement chain) is what scales.
  */
object Redact {

  /** Pattern strings (shared with the oracle SQL via [[patterns]]). */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPat = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Octets are range-checked (0-255) so version-ish dotted numbers
    * like `999.1.1.1` or `1.2.3.456` don't inflate the scan counts;
    * zero-padded octets (`192.168.001.001`, common in syslog exports)
    * still match — for REDACTION the safe error is over-scrub, so the
    * range check must not shrink recall on real IP notation. Pure
    * alternation (RE2-safe, no lookaround).
    */
  private val Ipv4Octet = "(?:25[0-5]|2[0-4]\\d|[01]?\\d{1,2})"
  val Ipv4Pat = s"\\b$Ipv4Octet(?:\\.$Ipv4Octet){3}\\b"
  val PhonePat = "\\+\\d[\\d\\-() ]{7,}\\d"

  /** (name, pattern, replacement) in REDACTION ORDER — email first
    * (its local part may contain digits), then the digit-shaped
    * patterns from most to least specific so the greedy phone pattern
    * never eats an SSN or IP.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailPat, "[EMAIL]"),
    ("ssn", SsnPat, "[SSN]"),
    ("ip", Ipv4Pat, "[IP]"),
    ("phone", PhonePat, "[PHONE]")
  )

  private def count(text: Column, pat: String): Column =
    size(regexp_extract_all(text, lit(pat), lit(0)))

  /** Per-type PII hit counts: n_emails, n_ssns, n_ips, n_phones.
    *
    * Semantics: each count is an INDEPENDENT scan of the original
    * text, not a reconciliation of [[redact]]'s sequential replacement
    * chain — a string matching two patterns (e.g. an SSN embedded in
    * an email's local part) counts under both even though redaction
    * replaces it once, under the first pattern in [[patterns]] order.
    * Known recall limit: [[PhonePat]] requires the leading `+`
    * (international form); domestic forms like `(555) 123-4567` are
    * deliberately not matched — a bare-digit-run pattern false-flags
    * ids, quantities and timestamps far more than it catches phones.
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    patterns.map { case (name, pat, _) => s"n_${name}s" -> count(text, pat) }

  /** Any-PII predicate (the filter form: drop rows that leak). */
  def containsPii(text: Column): Column =
    patterns.map { case (_, pat, _) => count(text, pat) > 0 }.reduce(_ || _)

  /** Redacted text: every match replaced with its type tag, applied in
    * [[patterns]] order.
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (acc, (_, pat, tag)) => regexp_replace(acc, pat, tag) }
}
