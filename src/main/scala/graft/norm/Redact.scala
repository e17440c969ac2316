package graft.norm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: emails, IPv4 addresses and
  * phone-like digit runs are replaced with stable placeholder tokens
  * so the model never memorizes them while sentence structure (and
  * token counts per redacted entity) stays learnable. The reference
  * NORMALIZES these fields for matching (normalizers.py lowercases
  * emails and strips phone punctuation); redaction is the
  * training-data-side operation over free text — a new operator, not
  * a port.
  *
  * All three are single `regexp_replace` calls — codegen'd Column
  * expressions, no UDF — and every pattern is written in the common
  * subset of Java regex and RE2 (no backreferences, no lookaround),
  * so the DuckDB oracle applies the IDENTICAL pattern and must
  * byte-match (`norm_redact`).
  *
  * Order matters and is part of the contract: emails first (an email
  * body contains digit runs a phone pattern could bite), then IPv4
  * (dotted digit runs the phone pattern could bite), then phones.
  */
object Redact {

  /** `local@domain.tld` — local is the practical RFC subset, domain
    * labels end in an alphabetic TLD of 2+ chars.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, octets 1-3 digits, digit-boundary guarded on
    * both ends (rejects 1.2.3.4.5 eating a prefix mid-run).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone-like run: optional +country, then 9-14 digits with
    * optional single separators (space, dot, dash, parens) between
    * groups — matches +1 (555) 010-4477, 555-010-4477, 5550104477;
    * too short for ordinary years/quantities (needs >= 9 digits).
    * \b guards keep it off longer digit runs' interiors.
    */
  val PhoneRe = "\\+?\\b\\d[\\d().]{0,3}(?:[ .-]?\\(?\\d\\)?){7,12}\\d\\b"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailRe, "<EMAIL>")

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Re, "<IP>")

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhoneRe, "<PHONE>")

  /** The full pass in contract order. */
  def redactPii(text: Column): Column =
    redactPhones(redactIps(redactEmails(text)))
}
