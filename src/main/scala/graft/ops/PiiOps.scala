package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub stage every published web-corpus
  * pipeline runs before training (emails, IP addresses, phone numbers).
  *
  * Everything is built from codegen'd `regexp_extract_all` /
  * `regexp_replace` over patterns chosen to mean the same thing in Java
  * regex and RE2 (no backrefs, no lookaround, ASCII classes only), so the
  * DuckDB oracle can replay the exact pipeline.
  *
  * Scale shape: pure scan-local expressions — no shuffle, no UDF, no
  * state; the whole scrub rides inside WholeStageCodegen next to the scan.
  */
object PiiOps {

  /** RFC-ish email: local part, @, dotted domain with ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 with word boundaries (permissive octets — a scrubber
    * over-redacts rather than leaks; `is_global_ip` is the strict gate).
    */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International-format phone: `+` and 7–15 digits (E.164 envelope).
    * National formats vary too much for a cross-engine-stable pattern.
    */
  val PhoneRe = "\\+[0-9]{7,15}"

  private val EmailTag = "<EMAIL>"
  private val IpTag = "<IP>"
  private val PhoneTag = "<PHONE>"

  /** The three scrub stages, applied in sequence. Order matters and is
    * part of the contract: emails first (a local part may embed `+digits`
    * that the phone pattern would otherwise eat), then IPv4 (the
    * `<EMAIL>` tag is digit-free, so no false quads), then phones.
    */
  def redactEmails(text: Column): Column = regexp_replace(text, EmailRe, EmailTag)
  def redactIps(text: Column): Column = regexp_replace(text, Ipv4Re, IpTag)
  def redactPhones(text: Column): Column = regexp_replace(text, PhoneRe, PhoneTag)

  /** Fully scrubbed text: emails → `<EMAIL>`, IPv4 → `<IP>`, phones →
    * `<PHONE>`, in that order.
    */
  def redactPii(text: Column): Column =
    redactPhones(redactIps(redactEmails(text)))

  /** Per-category match counts, each counted on the text AFTER the
    * previous stages redacted (so a digit run inside an email is an email,
    * never also a phone): `struct(n_emails, n_ips, n_phones)`, all long.
    */
  def piiCounts(text: Column): Column = {
    val afterEmail = redactEmails(text)
    val afterIp = redactIps(afterEmail)
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
  }
}
