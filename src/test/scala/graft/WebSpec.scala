package graft

import org.apache.spark.sql.functions._
import graft.functions.Web

/** URL canonicalization edge cases beyond what the t28 fixture produces:
  * non-default ports, hosts without www., fragment-only tails, queries
  * that vanish entirely, bare-host URLs, non-URL strings.
  */
class WebSpec extends SparkSpec {

  private def canon(url: String): String =
    spark.sql(s"SELECT '$url' AS u")
      .select(Web.canonicalUrl(col("u"))).head().getString(0)

  test("lowercases scheme and host, preserves path case") {
    assert(canon("HTTPS://ExAmPlE.CoM/KeepCase") ==
      "https://example.com/KeepCase")
  }

  test("strips default port only for the matching scheme") {
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
  }

  test("strips leading www. but not interior www") {
    assert(canon("https://www.a.com/x") == "https://a.com/x")
    assert(canon("https://wwwx.a.com/x") == "https://wwwx.a.com/x")
    assert(canon("https://a.www.com/x") == "https://a.www.com/x")
  }

  test("drops fragment, keeps sorted non-tracking query") {
    assert(canon("https://a.com/x?b=2&a=1#frag") == "https://a.com/x?a=1&b=2")
    assert(canon("https://a.com/x#only-frag") == "https://a.com/x")
  }

  test("tracking params drop; query that empties loses the '?'") {
    assert(canon("https://a.com/x?utm_source=f&utm_medium=e") ==
      "https://a.com/x")
    assert(canon("https://a.com/x?gclid=1&b=2&fbclid=z&ref=h&msclkid=q") ==
      "https://a.com/x?b=2")
  }

  test("path normalization: duplicate slashes, trailing slash, empty path") {
    assert(canon("https://a.com//x///y/") == "https://a.com/x/y")
    assert(canon("https://a.com/") == "https://a.com/")
    assert(canon("https://a.com") == "https://a.com/")
    assert(canon("https://a.com?a=1") == "https://a.com/?a=1")
  }

  test("non-URL input degrades to an empty-scheme skeleton, never throws") {
    assert(canon("not a url") == ":///")
  }

  test("urlHost alone serves as the per-domain aggregation key") {
    val h = spark.sql("SELECT 'https://WWW.News.Site.ORG:443/a/b?x=1' AS u")
      .select(Web.urlHost(col("u"))).head().getString(0)
    assert(h == "news.site.org")
  }
}
