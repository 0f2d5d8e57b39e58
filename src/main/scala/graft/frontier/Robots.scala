package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robots.txt gate.
  *
  * The reference ignores robots entirely — Selenium `driver.get` fetches
  * regardless (`/root/reference/web_scraper_pipeline.py:61`), so the DEFAULT
  * here is allow-all to preserve reference parity (SURVEY.md §2.3). The
  * north rule mandates the machinery: a per-executor robots cache broadcast
  * from the driver. Rules are a compact prefix model: per host, a list of
  * disallowed path prefixes (the subset of the robots exclusion protocol that
  * is decidable without fetch-time state).
  *
  * At 10^10 scale the broadcast holds rules only for hosts present in the
  * current wave (robots for 10^8 hosts do not fit one broadcast; per-wave
  * host sets do — a wave is host-partitioned anyway).
  */
object Robots {

  /** host → disallowed path prefixes. Empty map = allow everything. */
  final case class Rules(disallowByHost: Map[String, Seq[String]]) extends Serializable {
    def allows(host: String, path: String): Boolean =
      disallowByHost.get(host) match {
        case None => true
        case Some(prefixes) => !prefixes.exists(p => p.nonEmpty && path.startsWith(p))
      }
  }

  val AllowAll: Rules = Rules(Map.empty)

  /** Filter a frame carrying `host` and `canonical_url` by broadcast rules.
    * The predicate is a Column expression over a broadcast handle — one
    * deserialized rules map per executor, zero per-row allocation.
    */
  def filterAllowed(df: DataFrame, rules: Rules): DataFrame = {
    if (rules.disallowByHost.isEmpty) return df // allow-all: no-op, no scan cost
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(rules)
    val allowed = udf { (host: String, url: String) =>
      val path = {
        val i = url.indexOf("://")
        if (i < 0) "/"
        else {
          val rest = url.substring(i + 3)
          val s = rest.indexOf('/')
          if (s < 0) "/" else {
            val q = rest.indexOf('?')
            if (q >= 0 && q > s) rest.substring(s, q) else rest.substring(s)
          }
        }
      }
      bc.value.allows(host, path)
    }
    df.where(allowed(col("host"), col("canonical_url")))
  }
}
