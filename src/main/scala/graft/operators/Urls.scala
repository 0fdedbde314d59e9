package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-corpus deduplication — the
  * normalizer every web-scale pipeline runs before URL-keyed dedup
  * (the reference normalizes its source URIs before keying caches;
  * crawl pipelines do the same to collapse syntactic URL variants).
  *
  * Canonical form:
  *   - fragment dropped (`#...` never reaches the server);
  *   - scheme and host lowercased (case-insensitive per RFC 3986);
  *   - default ports dropped (`:80` for http, `:443` for https);
  *   - trailing slashes stripped from the path;
  *   - `utm_*` tracking parameters removed, remaining query
  *     parameters sorted (order never changes server content);
  *   - everything else (path case, non-utm params) preserved.
  *
  * Pure map-side column math (regexp + array ops) — zero exchanges;
  * the RE2-safe regex subset (no backrefs / lookahead) keeps the
  * DuckDB twin character-identical.
  */
object Urls {

  /** Canonicalize a URL string column. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort =
      when(port === "", lit(""))
        .when(scheme === "http" && port === "80", lit(""))
        .when(scheme === "https" && port === "443", lit(""))
        .otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), host, keepPort, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }
}
