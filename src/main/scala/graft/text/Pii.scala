package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / pattern redaction — standard pre-training hygiene: emails, phone
  * numbers, and IPv4 addresses are scrubbed to placeholder tokens before
  * text enters a training corpus, with per-row match counts kept as the
  * audit surface (how much was redacted, by category, without storing what).
  *
  * Shape: one projection of chained native `regexp_replace` /
  * `regexp_count` calls — codegen'd, no UDF, no shuffle; the scrub fuses
  * into whatever projection reads the corpus next.
  *
  * The patterns deliberately use the regex subset with identical semantics
  * in Java's engine and RE2-style engines (no lookaround, no backrefs), so
  * the operator is exactly replayable by other systems (q57's oracle).
  * Replacement tokens contain no digits or '@', which makes the scrub
  * IDEMPOTENT: scrub(scrub(x)) == scrub(x) (property-tested).
  *
  * Scrub order is emails → IPv4 → phones: an IPv4 octet run can never
  * produce a phone-shaped remainder and vice versa (the `\b` anchors and
  * digit-group widths are disjoint), but the fixed order makes the
  * composition deterministic by construction rather than by argument.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** The scrubbed text: all three categories replaced by their tokens. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Adds `text_scrubbed` plus per-category match counts (`n_emails`,
    * `n_ips`, `n_phones`) counted on the ORIGINAL text — the counts are
    * audit metadata for threshold tuning and must not depend on the
    * rewrite order.
    */
  def withRedactions(docs: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    docs
      .withColumn("text_scrubbed", scrub(text))
      .withColumn("n_emails", regexp_count(text, lit(EmailPattern)).cast("long"))
      .withColumn("n_ips", regexp_count(text, lit(Ipv4Pattern)).cast("long"))
      .withColumn("n_phones", regexp_count(text, lit(PhonePattern)).cast("long"))
  }
}
