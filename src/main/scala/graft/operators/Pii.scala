package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every public-web
  * training corpus runs before release (emails, phone numbers, national-id
  * and IP patterns replaced by placeholder tokens, cf. the C4/Dolma/RedPajama
  * curation pipelines).
  *
  * Pure per-row regex maps: no shuffle, no state, scales with corpus bytes
  * and parallelizes with the scan. Every pattern restricts itself to regex
  * constructs with identical semantics in Java regex (Spark) and RE2-family
  * engines (the DuckDB oracle): no `\s`, no lookaround, no backreferences,
  * alternations whose branches are disjoint on their first character (so
  * leftmost-first vs leftmost-longest engines agree).
  *
  * Pattern scope is deliberately conservative (formatted NANP phones,
  * dashed SSNs, dotted-quad IPs): a curation pipeline prefers precision —
  * a false positive deletes real text. Recall-heavier patterns (unformatted
  * 10-digit runs, international formats) belong in a locale-specific pass.
  *
  * No reference analog (beyond-reference op for the LLM-pipeline layer).
  */
object Pii {

  /** user@host.tld — same class shape as [[TextOps.cleanText]]'s mail rule. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US SSN shape ddd-dd-dddd; `\b` guards reject longer digit runs
    * (Java default `\w` and RE2 `\w` are both ASCII — identical boundary
    * semantics). */
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** NANP phone, `(ddd) ddd-dddd` or `ddd-ddd-dddd`; the two branches are
    * disjoint on their first character. */
  val PhonePattern = "(\\([0-9]{3}\\) |\\b[0-9]{3}-)[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (no range check — scrubbing prefers over-matching
    * x.y.z.w shapes to leaking real addresses). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Per-document PII hit counts and a `has_pii` flag.
    * Counts overlap-free occurrences of each pattern independently — a
    * phone number does not also count as an SSN (the shapes are disjoint:
    * 3-3-4 vs 3-2-4 digit groups). */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nEmail = regexp_count(t, lit(EmailPattern))
    val nSsn = regexp_count(t, lit(SsnPattern))
    val nPhone = regexp_count(t, lit(PhonePattern))
    val nIp = regexp_count(t, lit(Ipv4Pattern))
    df.select(col(idCol),
      nEmail.as("n_emails"), nSsn.as("n_ssns"),
      nPhone.as("n_phones"), nIp.as("n_ips"),
      (nEmail + nSsn + nPhone + nIp > 0).as("has_pii"))
  }

  /** Replace every PII hit with a placeholder token. Order matters and is
    * fixed: emails first (an email can contain digit runs), then SSNs, then
    * phones, then IPs — the oracle replays the same chain. */
  def redact(text: Column): Column = {
    val noMail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noSsn = regexp_replace(noMail, SsnPattern, "<SSN>")
    val noPhone = regexp_replace(noSsn, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, Ipv4Pattern, "<IP>")
  }
}
