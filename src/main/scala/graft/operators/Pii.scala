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

  /** k-anonymity screen (Sweeney 2002): every row joined with the size of
    * its quasi-identifier equivalence class (`anon_set`) and a flag for
    * classes smaller than `k` — the rows whose quasi-identifier
    * combination could single a person out and that a release either
    * suppresses or generalizes.
    *
    * One hash-aggregate on the quasi-identifier key, partial map-side, and
    * a broadcast-free equi-join back on the same key — the join reuses the
    * aggregation's hash partitioning, so the whole screen is ~one shuffle
    * of the distinct classes plus one of the fact rows. No window over the
    * full table (a `count(*) OVER (PARTITION BY qid…)` would sort every
    * class; the aggregate+join shape never sorts).
    *
    * NULL quasi-identifiers form their own equivalence class: the join
    * back is null-safe (`<=>`), so a row with a NULL QI is counted and
    * flagged rather than silently dropped — a privacy screen must fail
    * CLOSED on exactly the unusual rows. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    Guards.requireNoReserved(df.columns,
      quasiCols.map(c => s"__qi_$c") ++ Seq("anon_set", "below_k"),
      "Pii.kAnonymity")
    val renamed = quasiCols.map(c => c -> s"__qi_$c")
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("anon_set"))
      .select(renamed.map { case (c, r) => col(c).as(r) } :+ col("anon_set"): _*)
    // <=> keys are still hash-join keys (Catalyst extracts EqualNullSafe
    // into the equi-join key list), so the one-shuffle shape is unchanged
    val cond = renamed.map { case (c, r) => col(c) <=> col(r) }.reduce(_ && _)
    df.join(sizes, cond)
      .drop(renamed.map(_._2): _*)
      .withColumn("below_k", col("anon_set") < k)
  }

  /** l-diversity companion (Machanavajjhala 2007): per quasi-identifier
    * class, the number of DISTINCT sensitive values. A class can be
    * k-anonymous yet still leak (all members share one diagnosis);
    * `distinct_sensitive < l` flags those. Same aggregate+join shape (and
    * the same null-safe join back, so NULL-QI rows are retained and
    * flagged) as [[kAnonymity]] with a distinct-count in the class pass. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    Guards.requireNoReserved(df.columns,
      quasiCols.map(c => s"__qi_$c") ++ Seq("distinct_sensitive", "below_l"),
      "Pii.lDiversity")
    val renamed = quasiCols.map(c => c -> s"__qi_$c")
    val div = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .select(renamed.map { case (c, r) => col(c).as(r) } :+
        col("distinct_sensitive"): _*)
    val cond = renamed.map { case (c, r) => col(c) <=> col(r) }.reduce(_ && _)
    df.join(div, cond)
      .drop(renamed.map(_._2): _*)
      .withColumn("below_l", col("distinct_sensitive") < l)
  }
}
