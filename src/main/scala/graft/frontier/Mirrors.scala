package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirror-host detection (Bharat & Broder, WWW '99 "A comparison of
  * techniques to find mirrored hosts on the web"): host PAIRS that serve
  * the same content under different names. A crawler that knows h2 mirrors
  * h17 fetches one of them and maps the other's urls — at Common-Crawl
  * scale whole CDN/vanity-domain families are mirrors, and fetching them
  * all burns politeness budget on bytes the dedup stage throws away
  * anyway. This is the HOST-level complement to the page-level channels:
  * `Canonical.collapse` trusts in-page declarations, `Redirects.resolve`
  * trusts headers; mirror detection needs neither — it works from content
  * alone.
  *
  * Kernel: digest every page (md5 — constant-width join keys; the join
  * must never move html), keep DISTINCT (host, digest) so intra-host
  * duplicates don't inflate the evidence, drop digests served by more
  * than `maxHostsPerDigest` hosts BEFORE the self-join (empty pages,
  * "domain parked" boilerplate — the m² guard, same discipline as
  * `Dedup.fingerprintOverlap`'s maxDocFreq), then one digest equi-self-join
  * ordered host_a < host_b and a map-combinable pair rollup. Evidence is
  * `containment_ppm` = shared ∕ min(|a|, |b|) in integer ppm — the
  * asymmetric-size-robust measure (a small vanity host fully contained in
  * a big one IS a mirror even though Jaccard is tiny; the q86 containment
  * argument at host granularity).
  *
  * Scale shape: shuffles carry (host, 32-char digest) rows only; the
  * boilerplate cap bounds per-digest join fan-out at maxHostsPerDigest²;
  * host sizes ride two equi-joins against a #hosts-sized rollup. Nothing
  * is all-pairs.
  */
object Mirrors {

  /** Mirror-candidate host pairs with shared-digest evidence.
    *
    * @param maxHostsPerDigest digests on more hosts than this are
    *   boilerplate and contribute no evidence (cap BEFORE the self-join)
    * @param minShared minimum shared distinct digests to report a pair
    * @param minPpm minimum containment (shared ∕ smaller host's corpus) ppm
    */
  def mirrorPairs(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html", maxHostsPerDigest: Int = 64,
      minShared: Long = 2L, minPpm: Long = 500000L): DataFrame = {
    val hd = pages
      // binary cast: bytes go straight to md5 — no UTF-8 round-trip for
      // BINARY html, identical digests for STRING html (see Revisit)
      .select(graft.functions.host_of(col(urlCol)).as("host"),
        md5(col(htmlCol).cast("binary")).as("digest"))
      .distinct()
    val hot = hd.groupBy("digest").agg(count(lit(1)).as("__nh"))
      .where(col("__nh") > maxHostsPerDigest)
      .select("digest")
    val kept = hd.join(hot, Seq("digest"), "left_anti")
    val sizes = kept.groupBy("host").agg(count(lit(1)).as("n_digests"))
    val pairs = kept.select(col("digest"), col("host").as("host_a"))
      .join(kept.select(col("digest"), col("host").as("host_b")), Seq("digest"))
      .where(col("host_a") < col("host_b"))
      .groupBy("host_a", "host_b")
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("host").as("host_a"), col("n_digests").as("size_a")),
        Seq("host_a"))
      .join(sizes.select(col("host").as("host_b"), col("n_digests").as("size_b")),
        Seq("host_b"))
      .withColumn("containment_ppm",
        expr("(1000000 * shared) DIV least(size_a, size_b)"))
      .where(col("shared") >= minShared && col("containment_ppm") >= minPpm)
      .select("host_a", "host_b", "shared", "size_a", "size_b",
        "containment_ppm")
  }
}
