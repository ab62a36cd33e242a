package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives: URL canonicalization for dedup keys and
  * per-domain statistics — the stage a crawl-derived training corpus runs
  * before any content-level dedup (public practice: C4 / ccnet-style
  * pipelines dedup by canonical URL first, then by content).
  *
  * Everything here is pure Column algebra over `functions._` — regexp
  * splits plus array HOFs, no UDFs — so the whole canonicalization stays
  * inside whole-stage codegen and runs as a narrow projection: at 100 TB
  * it adds zero shuffles to whatever plan consumes it.
  *
  * Canonical form produced:
  *   - scheme and host lowercased; path case preserved (case-significant
  *     on most origins)
  *   - default ports stripped (`:443` for https, `:80` for http)
  *   - leading `www.` stripped from the host
  *   - fragment dropped
  *   - tracking parameters dropped (utm_*, fbclid, gclid, msclkid, ref)
  *   - surviving query parameters sorted (order never carries meaning for
  *     a dedup key); empty query drops the `?`
  *   - duplicate slashes in the path collapsed, trailing slash stripped,
  *     empty path normalized to `/`
  */
object Web {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  /** Lowercased scheme (empty string when the value is not a URL). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host: default port for the scheme and leading www. stripped. */
  def urlHost(url: Column): Column = {
    val raw = lower(regexp_extract(url, "^[^:]+://([^/?#]+)", 1))
    val noPort = when(urlScheme(url) === "https", regexp_replace(raw, ":443$", ""))
      .when(urlScheme(url) === "http", regexp_replace(raw, ":80$", ""))
      .otherwise(raw)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path with duplicate slashes collapsed and the trailing slash stripped;
    * an empty path (or bare root) normalizes to "/". */
  def urlPath(url: Column): Column = {
    val raw      = regexp_extract(url, "^[^:]+://[^/?#]*([^?#]*)", 1)
    val squeezed = regexp_replace(raw, "/{2,}", "/")
    val noTrail  = regexp_replace(squeezed, "/$", "")
    when(noTrail === "", lit("/")).otherwise(noTrail)
  }

  /** Query string with tracking parameters removed and the survivors
    * sorted; empty string when nothing survives (fragment never included). */
  def urlQuery(url: Column): Column = {
    val raw  = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(raw, "&"), p => !p.rlike(TrackingParam) && p =!= "")
    array_join(array_sort(kept), "&")
  }

  /** Full canonical URL (see object doc for the normalization contract). */
  def canonicalUrl(url: Column): Column = {
    val q = urlQuery(url)
    concat(urlScheme(url), lit("://"), urlHost(url), urlPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
