package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation: scrub emails, phone numbers
  * and IPv4 addresses out of document text before it reaches a training
  * corpus.
  *
  * Pure per-row `regexp_replace` projections — codegen'd, no shuffle, no
  * UDF — so redaction pipelines into the scan and costs one pass at any
  * scale. The patterns deliberately use only the regex subset with
  * identical semantics in Java regex (Spark) and RE2 (DuckDB/Trino-style
  * engines): character classes, bounded repetition, `\b` word boundaries —
  * no backrefs, no lookaround — keeping every redaction oracle-checkable
  * across engines.
  */
object PiiRedaction {

  /** user@host.tld — local part per RFC-ish practical subset. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone shape `+CC-NNN-NNNN`. */
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4, word-bounded so it can't eat into longer digit runs. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailRe, "<EMAIL>")

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhoneRe, "<PHONE>")

  def redactIpv4(text: Column): Column =
    regexp_replace(text, Ipv4Re, "<IP>")

  /** Full scrub. Order matters and is part of the contract: emails first
    * (their host part would otherwise be visible to the IPv4 pattern when
    * numeric), then phones, then bare IPs.
    */
  def redactPii(text: Column): Column =
    redactIpv4(redactPhones(redactEmails(text)))
}
