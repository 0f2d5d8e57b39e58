package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DUST rule mining — "Different URLs with Similar Text" (Bar-Yossef,
  * Keidar & Schonfeld, WWW '07 "Do not crawl in the DUST"): learn, from
  * crawl evidence alone, which URL query parameters are
  * CONTENT-IRRELEVANT per host (session ids, tracking tags, print
  * flags), so the canonicalizer can strip them BEFORE the seen-filter
  * and the frontier stops fetching the same page under a thousand
  * aliases. This is the learned complement to the static channels:
  * `rel=canonical` trusts the page, redirects trust headers,
  * [[Scheduler.capPerTemplate]] caps blind — DUST rules come with
  * measured support.
  *
  * Kernel: digest every page (md5 — the join never moves html), take
  * DISTINCT (url, digest) so re-fetches don't manufacture evidence, and
  * for every parameter of every parameterized url build the
  * one-param-stripped variant (order of the remaining params preserved).
  * A rule candidate (host, param) earns one unit of support for each
  * stripped variant that EXISTS in the corpus with the SAME digest —
  * i.e. the crawl actually observed both aliases and the bytes agreed.
  * Content-AFFECTING params fail the digest equality and accumulate
  * nothing.
  *
  * Scale shape: fan-out is the per-url parameter count, capped at
  * `maxParams` (hostile query strings with hundreds of '&'s contribute
  * nothing); the evidence join is a distinct-keyed equi-join on
  * (url, digest); the rollup is map-combinable counts. The per-row
  * array work runs on ≤ maxParams-element arrays — interpreted HOF cost
  * is bounded per row, unlike the n-gram case that forced a codegen
  * kernel.
  */
object Dust {

  /** (host, param, support) rules with `support >= minSupport`. */
  def paramStripRules(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html", minSupport: Long = 2L,
      maxParams: Int = 16): DataFrame = {
    val base = pages
      .select(col(urlCol).as("url"),
        md5(col(htmlCol).cast("string")).as("digest"))
      .distinct()
    val q = base
      .withColumn("qpos", instr(col("url"), "?"))
      .where(col("qpos") > 0)
      .withColumn("stem", expr("substring(url, 1, qpos - 1)"))
      .withColumn("params", split(expr("substring(url, qpos + 1)"), "&"))
      .where(size(col("params")) <= maxParams)
    val ex = q.select(col("url"), col("digest"), col("stem"), col("params"),
      posexplode(col("params")).as(Seq("pos", "kv")))
    val others = filter(col("params"), (_, i) => i =!= col("pos"))
    val stripped = when(size(others) === 0, col("stem"))
      .otherwise(concat(col("stem"), lit("?"), concat_ws("&", others)))
    val cands = ex.select(
      graft.functions.host_of(col("url")).as("host"),
      substring_index(col("kv"), "=", 1).as("param"),
      stripped.as("url2"), col("digest"))
    val hits = cands.join(
      base.select(col("url").as("url2"), col("digest")), Seq("url2", "digest"))
    hits.groupBy("host", "param")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Apply learned rules: strip every (host, param) rule's parameter from
    * the urls it applies to — the frontier-side consumer (broadcast-sized
    * rules table joined once; urls without matching rules pass through).
    *
    * Operates on the RAW query string, so a fragment still attached to the
    * last parameter ("…&sid=1#frag") would be stripped with it — callers
    * run this BEFORE canonicalization (the wave loop's order), where the
    * canonicalizer owns fragment semantics; a stripped fragment was going
    * to be dropped there anyway.
    */
  def applyRules(urls: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val withHost = urls.withColumn("__host",
      graft.functions.host_of(col(urlCol)))
    val hostRules = rules.groupBy(col("host").as("__host"))
      .agg(collect_set(col("param")).as("__strip"))
    withHost
      .join(broadcast(hostRules), Seq("__host"), "left")
      .withColumn("__qpos", instr(col(urlCol), "?"))
      .withColumn(urlCol,
        when(col("__strip").isNull || col("__qpos") === 0, col(urlCol))
          .otherwise {
            val stem = expr(s"substring($urlCol, 1, __qpos - 1)")
            val params = split(expr(s"substring($urlCol, __qpos + 1)"), "&")
            val kept = filter(params,
              p => !array_contains(col("__strip"), substring_index(p, "=", 1)))
            when(size(kept) === 0, stem)
              .otherwise(concat(stem, lit("?"), concat_ws("&", kept)))
          })
      .drop("__host", "__strip", "__qpos")
  }
}
