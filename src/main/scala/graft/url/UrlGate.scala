package graft.url

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{host_of, url_path}

/** URL-level quality gate — the pre-fetch filtering stage every production
  * web-corpus pipeline runs (RefinedWeb / CCNet style): a domain blocklist
  * (UT1-adult-list shape) matched against the host AND ITS PARENT DOMAINS
  * (a list entry `bad.test` must catch `ads.bad.test`), plus path keyword
  * screening — cheap URL-only signals that drop a fetch BEFORE paying for
  * it, which at crawl scale is the single highest-leverage quality filter.
  *
  * Shape: the blocklist is matched per DISTINCT host, not per row — hosts
  * are orders of magnitude fewer than urls, so the suffix explode
  * (≤ label-count rows per host) and the blocklist semi-join never touch
  * the frontier's row volume; the verdict joins back by host. The
  * blocklist side broadcasts (UT1 is a few million rows); a
  * larger-than-broadcast list would swap the semi-join for the bloom
  * bank + exact-verify pattern the seen-set already uses. Path keywords
  * compile into one codegen'd projection.
  */
object UrlGate {

  /** `a.b.c.test` → [a.b.c.test, b.c.test, c.test, test] — every suffix a
    * registered-domain blocklist entry could match. Bounded by the host's
    * label count; no public-suffix-list dependency (the blocklist's own
    * granularity decides where matches stop).
    */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(0), size(parts) - 1),
      i => concat_ws(".", slice(parts, i + 1, size(parts) - i)))
  }

  /** Adds `url_reasons` (sorted ARRAY<STRING>, empty = clean) and
    * `url_ok` to `frontier`. Reasons: `blocked_host` (host or any parent
    * domain in `blockedHosts`), `bad_path_word` (lower-cased path contains
    * any of `badWords`).
    *
    * @param blockedHosts one `host` STRING column (exact, lower-case)
    */
  def gate(frontier: DataFrame, urlCol: String, blockedHosts: DataFrame,
      badWords: Seq[String]): DataFrame = {
    val withHost = frontier.withColumn("_gate_host", lower(host_of(col(urlCol))))
    // distinct hosts → suffix explode → blocklist semi-join: the set of
    // BLOCKED hosts actually present, a frame bounded by the blocklist
    val blockedPresent = withHost.select(col("_gate_host")).distinct()
      .withColumn("_sfx", explode(hostSuffixes(col("_gate_host"))))
      .join(broadcast(blockedHosts.select(lower(col("host")).as("_sfx"))),
        Seq("_sfx"), "left_semi")
      .select(col("_gate_host")).distinct()
      .withColumn("_host_blocked", lit(true))
    val path = lower(url_path(col(urlCol)))
    val wordHit = badWords.foldLeft(lit(false))((acc, w) =>
      acc || path.contains(w.toLowerCase(java.util.Locale.ROOT)))
    def reason(cond: Column, name: String): Column =
      when(cond, lit(name)).otherwise(lit(null).cast("string"))
    withHost
      .join(broadcast(blockedPresent), Seq("_gate_host"), "left")
      .withColumn("url_reasons", array_sort(filter(array(
        reason(coalesce(col("_host_blocked"), lit(false)), "blocked_host"),
        reason(wordHit, "bad_path_word")), r => r.isNotNull)))
      .withColumn("url_ok", size(col("url_reasons")) === 0)
      .drop("_gate_host", "_host_blocked")
  }

  /** Only the clean rows, original columns. */
  def allowed(frontier: DataFrame, urlCol: String, blockedHosts: DataFrame,
      badWords: Seq[String]): DataFrame =
    gate(frontier, urlCol, blockedHosts, badWords)
      .where(col("url_ok"))
      .select(frontier.columns.map(col): _*)
}
