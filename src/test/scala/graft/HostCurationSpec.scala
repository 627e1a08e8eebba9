package graft

import graft.rules.{HostCuration, RuleSerde, ViolationScanner}
import org.apache.spark.sql.functions._

/** Pins the host-grain curation plane (r15): URL canonicalization
  * (case, userinfo, default ports, tracking params, param order,
  * fragments), canonical host + registrable-domain heuristic, URL-grain
  * dedup, per-host rollups with the blocklist decision, and that host
  * blocklists are scannable rules the w7-style gate consumes
  * unchanged. */
class HostCurationSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): String =
    df.collect().head.getString(0)

  test("canonical host: case, userinfo, port, trailing dot, serving prefixes") {
    val cases = Seq(
      ("https://WWW.Example.COM/a/b", "example.com"),
      ("http://user:pw@m.example.co.uk:8080/x?q=1#f", "example.co.uk"),
      ("https://www2.news.example.org.", "news.example.org"),
      ("https://amp.site.net/page", "site.net"),
      ("ftp://files.example.com/pub", "files.example.com"),
      ("example.com/no-scheme", "example.com"),
      ("https://mmm.example.com/", "mmm.example.com")) // only m., not m*
    cases.foreach { case (url, want) =>
      val got = one(Seq(url).toDF("u").select(HostCuration.canonicalHost($"u")))
      assert(got == want, s"$url -> $got, want $want")
    }
  }

  test("registrable domain: cc-second-level heuristic") {
    val cases = Seq(
      ("news.example.co.uk", "example.co.uk"),
      ("a.b.example.com", "example.com"),
      ("example.ac.jp", "example.ac.jp"),
      ("localhost", "localhost"))
    cases.foreach { case (h, want) =>
      val got = one(Seq(h).toDF("h").select(HostCuration.registrableDomain($"h")))
      assert(got == want, s"$h -> $got, want $want")
    }
  }

  test("canonical URL: tracking params dropped, params sorted, fragment and default port stripped") {
    val cases = Seq(
      ("HTTPS://Example.com:443/p?utm_source=x&b=2&a=1#frag",
        "https://example.com/p?a=1&b=2"),
      ("http://example.com:80/p", "http://example.com/p"),
      ("http://example.com:8080/p", "http://example.com:8080/p"),
      // http on 443 is NOT the default port — kept
      ("http://example.com:443/p", "http://example.com:443/p"),
      ("https://example.com/p?fbclid=abc&gclid=x&ref=tw", "https://example.com/p"),
      ("https://user@example.com/P/Q?z=1&y=2", "https://example.com/P/Q?y=2&z=1"),
      // scheme-less: the PATH must survive (else every page of the
      // host collapses to one canonical URL and url_dup_frac reads a
      // clean host as a duplicate farm)
      ("Example.com/a?utm_source=x&b=1#f", "example.com/a?b=1"),
      ("example.com/b", "example.com/b"))
    cases.foreach { case (url, want) =>
      val got = one(Seq(url).toDF("u").select(HostCuration.canonicalUrl($"u")))
      assert(got == want, s"$url -> $got, want $want")
    }
  }

  test("URL dedup keeps the min-id doc per canonical URL") {
    val docs = Seq(
      (1L, "https://example.com/a?utm_source=x", "t1"),
      (2L, "https://EXAMPLE.com/a#top", "t2"), // same canonical as 1
      (3L, "https://example.com/b", "t3"))
      .toDF("doc_id", "url", "text")
    val kept = HostCuration.dropUrlDuplicates(docs, "url", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("keep-newest revisit keeps the max-(ts, id) doc per canonical URL") {
    val docs = Seq(
      (1L, "https://example.com/a?utm_source=x", 100L),
      (2L, "https://EXAMPLE.com/a#top", 300L),  // same canonical as 1, newer
      (3L, "https://example.com/a", 200L),      // same canonical, middle
      (4L, "https://example.com/b", 50L),
      (5L, "https://example.com/c", 70L),
      (6L, "https://example.com/c", 70L))       // ts tie -> larger id wins
      .toDF("doc_id", "url", "fetch_ts")
    val kept = HostCuration.keepNewestRevisit(docs, "url", "doc_id", "fetch_ts")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("host stats: URL-dup fraction bites where source grain is blind; " +
      "host blocklist rules scan unchanged") {
    val good = "The quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet meadow toward the river bank. " * 4
    // farm.com: every doc a tracking variant of ONE page (dup_frac 2/3)
    // clean.com: distinct pages, same quality
    val docs = Seq(
      (1L, "https://farm.com/p?id=1", good),
      (2L, "https://farm.com/p?id=1&utm_source=a", good),
      (3L, "https://farm.com/p?id=1&fbclid=zz", good),
      (4L, "https://clean.com/p1", good),
      (5L, "https://clean.com/p2", good),
      (6L, "https://www.clean.com/p3", good))
      .toDF("doc_id", "url", "text")
    val stats = HostCuration.hostStats(docs, "url", "text",
      minAvgQuality = 0.5, maxShortFrac = 1.0, maxUrlDupFrac = 0.5)
    val byHost = stats.collect().map(r => r.getAs[String]("host") -> r).toMap
    assert(byHost.keySet == Set("farm.com", "clean.com"))
    assert(byHost("farm.com").getAs[Boolean]("blocked"))
    assert(byHost("farm.com").getAs[Long]("n_urls") == 1L)
    assert(!byHost("clean.com").getAs[Boolean]("blocked"))
    assert(byHost("clean.com").getAs[String]("domain") == "clean.com")
    // the blocklist is the same scannable-rule contract as r14: a
    // violation scan over host-derived rows flags exactly farm.com docs
    val rules = HostCuration.hostBlocklistRules(stats)
    assert(rules.map(_.ruleName) == Seq("host_block(farm.com)"))
    assert(RuleSerde.fromJson(RuleSerde.toJson(rules)) == rules)
    val hosted = docs.withColumn("host", HostCuration.canonicalHost($"url"))
    val viol = ViolationScanner.scan(hosted, "docs", rules, "doc_id")
    assert(viol.select("row_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
