package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass web-crawl curation runs
  * before URL-level dedup (the cheapest dedup layer: two crawls of the same
  * page differ in tracking params, fragment, default port, www prefix, or
  * trailing slash long before their text differs; CCNet/RefinedWeb-style
  * pipelines dedup on the canonical URL first and only pay content dedup for
  * what survives). The reference pipeline has no web surface, so this is
  * purely the LLM-curation family.
  *
  * Canonical form, applied in order:
  *   1. fragment dropped (`#...`),
  *   2. scheme and host lowercased (path/query case is preserved — it is
  *      significant on most servers),
  *   3. a leading `www.` dropped,
  *   4. the scheme's DEFAULT port dropped (`:80` for http, `:443` for
  *      https) — a non-default port is identity-relevant and kept,
  *   5. trailing slashes on the path dropped,
  *   6. tracking query params dropped ([[TrackingParams]]), the survivors
  *      SORTED (param order is not identity), `?` dropped when none survive.
  *
  * Every regex stays in the Java∩RE2-identical subset (classes, anchors,
  * bounded repetition — no lookaround/backrefs), and the list lambdas map
  * 1:1 onto DuckDB's `list_filter`/`list_sort`, so the canonical STRING is
  * bit-equal cross-engine and the q146 oracle hashes it directly.
  *
  * Scale shape: pure per-row string rewriting (codegen'd regexp ops + one
  * row-local array sort over a handful of params) — no shuffle; the dedup
  * that follows is one groupBy on the canonical string, a uniform-key
  * exchange. At 100 TB this is the first and cheapest funnel stage.
  */
object UrlCanon {

  /** Tracking params dropped by rule 6 (RE2∩Java alternation, spliced into
    * both engines' filter lambda).
    */
  val TrackingParams: Seq[String] = Seq("utm_[a-z0-9_]+", "gclid", "fbclid", "ref")

  private[operators] val TrackerRe = s"^(${TrackingParams.mkString("|")})="
  private[operators] val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private[operators] val HostPortRe = "^([^/?]+)"

  /** Canonical form of `url` (an absolute http(s)-style URL). */
  def canonical(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val rest = regexp_replace(noFrag, SchemeRe, "")
    val host0 = regexp_replace(lower(regexp_extract(rest, HostPortRe, 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val pathQ = regexp_replace(rest, HostPortRe, "")
    val path = regexp_replace(regexp_extract(pathQ, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&", -1),
      t => t =!= "" && !t.rlike(TrackerRe)))
    val qs = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, path, qs)
  }

  /** DuckDB twin of [[canonical]] as a CTE chain body: given a relation
    * `from` exposing (`keyCol`, `urlCol`), emits CTEs `u1..u4` and a final
    * relation `canon` with (`keyCol`, canonical_url). Splice into a WITH
    * list; same regexes, same step order.
    */
  def canonicalSqlCtes(from: String, keyCol: String, urlCol: String): String =
    s"""u1 AS (SELECT $keyCol, regexp_replace($urlCol, '#.*$$', '') AS nofrag
       |       FROM $from),
       |u2 AS (SELECT $keyCol,
       |         lower(regexp_extract(nofrag, '$SchemeRe', 1)) AS scheme,
       |         regexp_replace(nofrag, '$SchemeRe', '') AS rest FROM u1),
       |u3 AS (SELECT $keyCol, scheme,
       |         regexp_replace(lower(regexp_extract(rest, '$HostPortRe', 1)),
       |                        '^www\\.', '') AS host0,
       |         regexp_replace(rest, '$HostPortRe', '') AS pathq FROM u2),
       |u4 AS (SELECT $keyCol, scheme,
       |         CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$$', '')
       |              WHEN scheme = 'https' THEN regexp_replace(host0, ':443$$', '')
       |              ELSE host0 END AS host,
       |         regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$$', '')
       |           AS path,
       |         list_sort(list_filter(
       |           string_split(regexp_extract(pathq, '\\?(.*)$$', 1), '&'),
       |           t -> t <> '' AND NOT regexp_matches(t, '$TrackerRe'))) AS ps
       |       FROM u3),
       |canon AS (SELECT $keyCol,
       |            scheme || '://' || host || path ||
       |            CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&')
       |                 ELSE '' END AS canonical_url
       |          FROM u4)""".stripMargin

  /** URL-level dedup: canonicalize, group, keep the smallest id per
    * canonical URL with the variant count — the report a crawl-dedup stage
    * emits before content dedup ever runs.
    */
  def dedup(df: org.apache.spark.sql.DataFrame, idCol: String,
            urlCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), canonical(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keeper_doc"), count(lit(1)).as("n_variants"))
}
