package graft.functions

import graft.SparkSpec

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def dom(s: String): String =
    Seq(Tuple1(s)).toDF("u")
      .select(UrlFunctions.extractDomain($"u")).as[String].head()

  test("host extraction strips scheme, userinfo, port, path, query") {
    assert(dom("https://example.com/a/b") == "example.com")
    assert(dom("http://example.com") == "example.com")
    assert(dom("https://bad.site:8080/x") == "bad.site")
    assert(dom("https://user@bad.site/x") == "bad.site")
    assert(dom("https://u:p@bad.site:443/x?q=1#f") == "bad.site")
    assert(dom("https://example.com?q=1") == "example.com")
  }

  test("an @ inside the query string cannot disguise the host as userinfo") {
    assert(dom("https://bad.site?x=@good.com") == "bad.site")
    assert(dom("https://good.com?next=@bad.site") == "good.com")
    assert(dom("https://bad.site#@good.com") == "bad.site")
  }

  test("non-URL input yields empty string (no-match convention)") {
    assert(dom("not a url") == "")
    assert(dom("ftp://example.com/x") == "")
  }
}
