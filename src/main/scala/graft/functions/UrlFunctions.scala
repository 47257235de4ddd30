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
}
