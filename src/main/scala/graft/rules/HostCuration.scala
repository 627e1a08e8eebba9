package graft.rules

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** HOST-grain corpus curation — the URL/domain triage every web-crawl
  * pipeline runs before document-grain filtering (RefinedWeb §3.1,
  * CCNet's per-domain statistics; the reference's source-level gesture
  * is the flat `source` column this module generalizes):
  *
  *  - URL canonicalization, so syndicated tracking variants of one
  *    page collapse BEFORE any content pass (`?utm_source=…`,
  *    fragments, default ports, scheme/host case);
  *  - canonical host + a registrable-domain heuristic (the rollup
  *    keys);
  *  - per-host quality/duplication rollups with a blocklist decision
  *    (the r14 [[CorpusRules.sourceStats]] shape at host grain, plus
  *    the URL-duplication fraction only this grain can see);
  *  - host blocklists as scannable rules (the [[CorpusRules
  *    .blocklistRules]] contract, so the w7-style stream gate consumes
  *    them unchanged);
  *  - per-host quotas ride the existing
  *    [[graft.text.Sampling.quotaSample]] surface.
  *
  * Everything is pure Column regexp/string work (RE2-safe — no
  * lookarounds/backrefs, so the DuckDB oracle replays each step
  * verbatim) plus counter-only groupBys: map-side combined,
  * host-cardinality output, no shuffle of document text. */
object HostCuration {

  /** Tracking query parameters dropped by [[canonicalUrl]] — the
    * standard strip set (utm_* plus the common click ids). */
  val TrackingParams: Seq[String] = Seq("utm_[a-z]+", "ref", "fbclid",
    "gclid", "sessionid")
  private val trackingRe = s"^(?:${TrackingParams.mkString("|")})="

  /** `scheme://[user@]AUTHORITY[/?#…]` → the lowercased authority with
    * any userinfo dropped; scheme-less strings fall back to their
    * first host-shaped prefix. Port is KEPT (callers split it off —
    * [[canonicalHost]] always, [[canonicalUrl]] only when it is the
    * scheme default). */
  private def authority(url: Column): Column = {
    val a = regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1)
    when(a =!= "", a)
      .otherwise(regexp_extract(lower(url), "^(?:[^/?#@]*@)?([^/?#]+)", 1))
  }

  /** Canonical HOST of a URL: lowercased authority, userinfo/port
    * stripped, trailing dot stripped, and the serving-variant
    * subdomain prefixes (`www\d*.`, `m.`, `amp.`) removed — mobile and
    * desktop variants of one site roll up together. */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(authority(url), ":[0-9]+$", ""),
        "\\.$", ""),
      "^(?:www[0-9]*|m|amp)\\.", "")

  /** Registrable-domain heuristic over a [[canonicalHost]] value: last
    * three labels when the second-level label is a common
    * country-code second-level (`co.uk`-shaped), else last two — the
    * standard public-suffix approximation when shipping the full PSL
    * is not warranted. */
  def registrableDomain(host: Column): Column = {
    val three = regexp_extract(host,
      "([^.]+\\.(?:co|com|net|org|gov|edu|ac)\\.[a-z][a-z])$", 1)
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(three =!= "", three).when(two =!= "", two).otherwise(host)
  }

  /** Canonical URL: lowercased scheme and host (path/query case is
    * semantic and kept), userinfo dropped, default port stripped
    * (http:80 / https:443), fragment dropped, tracking parameters
    * ([[TrackingParams]]) removed, and the surviving query parameters
    * SORTED — `?b=2&utm_source=x&a=1` ≡ `?a=1&b=2`. Array ops only
    * (split/filter/sort_array/array_join), all with DuckDB twins. */
  def canonicalUrl(url: Column): Column = {
    val scheme = regexp_extract(lower(url), "^([a-z][a-z0-9+.-]*)://", 1)
    val auth = authority(url)
    val host = when(
      (scheme === "http" && auth.endsWith(":80")) ||
        (scheme === "https" && auth.endsWith(":443")),
      regexp_replace(auth, ":[0-9]+$", "")).otherwise(auth)
    // scheme part optional: a scheme-less URL (in-contract — authority
    // handles it) must keep its PATH, else every page of the host
    // canonicalizes to one URL and url_dup_frac reads a clean host as
    // a duplicate farm
    val path = regexp_extract(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_join(
      sort_array(filter(split(query, "&"),
        p => p =!= "" && !regexp_like(p, lit(trackingRe)))), "&")
    concat(
      when(scheme =!= "", concat(scheme, lit("://"))).otherwise(lit("")),
      host, path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }

  /** One row per distinct [[canonicalUrl]], keeping the smallest doc
    * id — exact dedup at URL grain (tracking twins collapse here
    * without touching text). Same min-id-survivor shape as
    * [[graft.dedup.Dedup.dropExactDuplicates]]: one groupBy on the
    * canonical key. */
  def dropUrlDuplicates(docs: DataFrame, urlCol: String,
      idCol: String): DataFrame = {
    val keyed = docs.withColumn("__cu", canonicalUrl(col(s"`$urlCol`")))
    keyed.join(
        keyed.groupBy("__cu").agg(min(col(s"`$idCol`")).as(idCol)),
        Seq("__cu", idCol))
      .drop("__cu")
  }

  /** One row per distinct [[canonicalUrl]], keeping the NEWEST fetch
    * (ties to the largest doc id) — the cross-dump revisit policy: a
    * crawler re-fetches living pages every dump, and the corpus should
    * carry each page's latest version, not its first. The complement
    * of [[dropUrlDuplicates]] (which keeps the min-id survivor for
    * append-only dedup); same one-groupBy shape, with the winner
    * picked by a struct argmax on (fetch ts, id) — lexicographic
    * struct ordering, no window, no per-key sort. */
  def keepNewestRevisit(docs: DataFrame, urlCol: String, idCol: String,
      tsCol: String): DataFrame = {
    val keyed = docs.withColumn("__cu", canonicalUrl(col(s"`$urlCol`")))
    keyed.join(
        keyed.groupBy("__cu")
          .agg(max(struct(col(s"`$tsCol`"), col(s"`$idCol`"))).as("__w"))
          .select(col("__cu"), col(s"__w.$idCol").as(idCol)),
        Seq("__cu", idCol))
      .drop("__cu")
  }

  /** Per-host rollup with a blocklist decision — [[CorpusRules
    * .sourceStats]] at host grain plus the URL-duplication fraction:
    * (host, domain, n_docs, n_urls, sum_quality_e4, n_short,
    * avg_quality, url_dup_frac, short_frac, blocked). Quality sums are
    * exact ×10⁴ integers; only the final per-host ratios divide. A
    * host is blocked when its average quality, short-document
    * fraction, or URL-duplication fraction (near-identical tracking
    * variants — a syndication/SEO-farm signal invisible at document
    * grain) crosses its threshold.
    *
    * Scale shape: one groupBy(host) with counters and one exact
    * distinct-URL count (two-level aggregate on (host, url) — the
    * distinct grain is bounded by the corpus, never wider); output is
    * host-cardinality sized. */
  def hostStats(docs: DataFrame, urlCol: String, textCol: String,
      minAvgQuality: Double = 0.0, maxShortFrac: Double = 1.0,
      maxUrlDupFrac: Double = 1.0, shortLen: Int = 200): DataFrame = {
    val qE4 = TextAnalysis.qualityE4(textCol)
    docs
      .withColumn("__host", canonicalHost(col(s"`$urlCol`")))
      .withColumn("__cu", canonicalUrl(col(s"`$urlCol`")))
      .groupBy(col("__host").as("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__cu")).as("n_urls"),
        sum(qE4).as("sum_quality_e4"),
        sum(when(length(col(s"`$textCol`")) < shortLen, 1L).otherwise(0L))
          .as("n_short"))
      .withColumn("domain", registrableDomain(col("host")))
      .withColumn("avg_quality",
        col("sum_quality_e4").cast(DoubleType) /
          (col("n_docs").cast(DoubleType) * 10000d))
      .withColumn("url_dup_frac",
        (col("n_docs") - col("n_urls")).cast(DoubleType) /
          col("n_docs").cast(DoubleType))
      .withColumn("short_frac",
        col("n_short").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("blocked",
        col("avg_quality") < lit(minAvgQuality) ||
          col("short_frac") > lit(maxShortFrac) ||
          col("url_dup_frac") > lit(maxUrlDupFrac))
      .select("host", "domain", "n_docs", "n_urls", "sum_quality_e4",
        "n_short", "avg_quality", "url_dup_frac", "short_frac", "blocked")
  }

  /** The blocked hosts as scannable rules — the exact
    * [[CorpusRules.blocklistRules]] contract over a derived `host`
    * column, so every consumer of source blocklists (the r1-style
    * violation scan, the w7 stream gate's broadcast anti-join)
    * consumes host blocklists unchanged. */
  def hostBlocklistRules(stats: DataFrame,
      hostCol: String = "host"): Seq[CrossFieldRule] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    stats.filter(col("blocked")).select("host").collect().toSeq
      .map(_.getString(0))
      .sorted
      .map(h => CrossFieldRule(s"host_block($h)", s"`$hostCol` <> '${esc(h)}'"))
  }
}
