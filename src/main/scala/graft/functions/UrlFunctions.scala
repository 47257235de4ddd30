package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation: domain extraction and
  * blocklist-based filtering.
  *
  * `extractDomain` is a plain `regexp_extract` (Java∩RE2 subset — see
  * [[PiiRedaction]]) rather than Spark's `parse_url`, so the oracle side
  * reproduces it verbatim in any engine with regex support. Per-row
  * projection, codegen'd, pipelines into the scan.
  */
object UrlFunctions {

  /** Host extraction from an http(s) URL: skips optional userinfo
    * (`user@`), stops before port/path/query/fragment — otherwise
    * `https://bad.site:8080/x` or `https://u@bad.site/x` would slip past
    * a host blocklist. Empty string when the value isn't URL-shaped
    * (regexp_extract's no-match convention in both Spark and DuckDB).
    *
    * The userinfo class excludes `?`/`#` too: a greedy `[^/@]*@` would let
    * `https://bad.site?x=@good.com` smuggle its host out of the blocklist
    * by disguising everything before the query-string `@` as userinfo.
    */
  val DomainRe = "^https?://(?:[^/@?#]*@)?([^/:?#]+)"

  def extractDomain(url: Column): Column = regexp_extract(url, DomainRe, 1)

  /** URL canonicalization — the normalize-before-dedup step of a crawl
    * pipeline: the same logical page arrives as `https://WWW.Example.com/a`,
    * `https://example.com:443/a?utm_source=x` and `https://example.com/a#top`,
    * and URL-level dedup must collapse them BEFORE any content fetch.
    *
    * Steps, in order (each a codegen'd builtin; regexes in the Java∩RE2
    * subset — no lookaround — so the oracle replays them verbatim):
    *   0. lowercase a case-variant scheme (`HTTPS://` → `https://`) so the
    *      anchored steps below match case-insensitively-entered URLs,
    *   1. drop the fragment (`#…`),
    *   2. drop tracking params (`utm_*` incl. multi-underscore names like
    *      `utm_source_platform`, `gclid`, `fbclid`) and tidy the
    *      separators they leave behind,
    *   3. drop userinfo (`user@`) and the scheme-default port
    *      (`:80` for http, `:443` for https),
    *   4. lowercase the host (paths stay case-sensitive) and strip a
    *      leading `www.`,
    *   5. drop a bare root-path trailing slash (`https://x.com/` ≡
    *      `https://x.com`, deeper paths untouched).
    *
    * Non-URL-shaped values pass through steps that don't match — garbage
    * in, same garbage out, never null.
    */
  def canonicalizeUrl(url: Column): Column = {
    // a regex replacement cannot lowercase its capture, so the scheme fix
    // is extract-lower-reassemble; `(?i:…)` is in both Java and RE2
    val sch = regexp_extract(url, "^((?i:https?)://)", 1)
    val schemeLowered =
      when(sch === "", url)
        .otherwise(concat(lower(sch), expr_substr(url, length(sch) + 1)))
    val noFrag = regexp_replace(schemeLowered, "#.*$", "")
    // tracking params must START at a ?/& boundary (a param named
    // `xutm_source` is not a tracking param); removal leaves dangling
    // separators ("?&a", "a&&b", trailing ?/&) which the next two
    // replacements tidy
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag,
          "([?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*", "$1"),
        "([?&])&+", "$1"),
      "[?&]$", "")
    val noUser = regexp_replace(noTrack, "^(https?://)[^/@?#]*@", "$1")
    val noPort = regexp_replace(
      regexp_replace(noUser, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    // lowercase only scheme://host: split at the end of the authority
    val schemeHost = regexp_extract(noPort, "^(https?://[^/?#]+)", 1)
    val rest = expr_substr(noPort, length(schemeHost) + 1)
    val lowered = concat(
      regexp_replace(lower(schemeHost), "^(https?://)www\\.", "$1"), rest)
    when(schemeHost === "", noPort) // not URL-shaped: leave as-is
      .otherwise(regexp_replace(lowered, "^(https?://[^/?#]+)/$", "$1"))
  }

  // substring from a dynamic 1-based position to the end (the 3-arg
  // `substring` builtin needs a literal; `substr(col, col)` does not)
  private def expr_substr(c: Column, pos: Column): Column =
    c.substr(pos, length(c))
}
