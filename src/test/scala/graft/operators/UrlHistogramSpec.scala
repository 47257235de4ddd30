package graft.operators

import graft.SparkSpec
import graft.functions.UrlFunctions
import org.apache.spark.sql.functions._

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("case, www, tracking, default port, fragment, userinfo all collapse") {
    val got = canon(
      "https://EXAMPLE.com/a/1",
      "https://www.example.com/a/1?utm_source=x&utm_medium=y",
      "https://example.com:443/a/1",
      "https://example.com/a/1#sec-2",
      "https://u@example.com/a/1",
      "http://example.com:80/a/1")
    assert(got.take(5).forall(_ == "https://example.com/a/1"), got)
    assert(got(5) == "http://example.com/a/1") // scheme stays distinct
  }

  test("real query params survive; tracking params at any position drop") {
    assert(canon("https://x.com/p?id=7") == Seq("https://x.com/p?id=7"))
    assert(canon("https://x.com/p?utm_a=1&id=7") == Seq("https://x.com/p?id=7"))
    assert(canon("https://x.com/p?id=7&utm_a=1") == Seq("https://x.com/p?id=7"))
    assert(canon("https://x.com/p?a=1&gclid=99&b=2")
      == Seq("https://x.com/p?a=1&b=2"))
    assert(canon("https://x.com/p?utm_a=1&utm_b=2") == Seq("https://x.com/p"))
    // a param merely CONTAINING a tracker name is not a tracker
    assert(canon("https://x.com/p?xutm_source=1")
      == Seq("https://x.com/p?xutm_source=1"))
  }

  test("non-default ports and deep-path slashes are preserved") {
    assert(canon("http://x.com:443/p") == Seq("http://x.com:443/p"))
    assert(canon("https://x.com:80/p") == Seq("https://x.com:80/p"))
    assert(canon("https://x.com:8080/p") == Seq("https://x.com:8080/p"))
    assert(canon("https://x.com/a/b/") == Seq("https://x.com/a/b/"))
    assert(canon("https://x.com/") == Seq("https://x.com"))
  }

  test("path case is preserved; host case is not") {
    assert(canon("https://X.com/CaseSensitive/Path")
      == Seq("https://x.com/CaseSensitive/Path"))
  }

  test("case-variant schemes canonicalize (incl. their port/host steps)") {
    assert(canon("HTTPS://Example.com/a/1") == Seq("https://example.com/a/1"))
    assert(canon("HTTP://x.com:80/p") == Seq("http://x.com/p"))
    assert(canon("HtTpS://u@x.com:443/") == Seq("https://x.com"))
  }

  test("multi-underscore and digit-bearing utm params drop") {
    assert(canon("https://x.com/p?utm_source_platform=y&id=7")
      == Seq("https://x.com/p?id=7"))
    assert(canon("https://x.com/p?utm_id2=7") == Seq("https://x.com/p"))
  }

  test("non-URL-shaped values pass through unchanged") {
    assert(canon("not a url", "ftp://x.com/a#f")
      == Seq("not a url", "ftp://x.com/a"))
    // (fragment strip is scheme-agnostic by design; host rules are not)
  }

  test("host blocklist evasion shapes from extractDomain stay canonical-safe") {
    // userinfo with ?/# cannot smuggle the host
    assert(canon("https://bad.site?x=@good.com/p")
      == Seq("https://bad.site?x=@good.com/p"))
  }
}

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed bins, max lands in the last bin") {
    // values 0..10 over [0,10], 5 bins of width 2; 10 joins bin 4
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val got = Profiler.histogram(df, "v", nBins = 5)
      .orderBy("bin")
      .as[(Int, java.math.BigDecimal, java.math.BigDecimal, Long)]
      .collect().toSeq
    assert(got.map(t => (t._1, t._4)) ==
      Seq((0, 2L), (1, 2L), (2, 2L), (3, 2L), (4, 3L)))
    assert(got.head._2 == new java.math.BigDecimal("0.000000"))
    assert(got.last._3 == new java.math.BigDecimal("10.000000"))
  }

  test("constant column degenerates to the single bin 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val got = Profiler.histogram(df, "v", nBins = 4)
      .as[(Int, java.math.BigDecimal, java.math.BigDecimal, Long)]
      .collect().toSeq
    assert(got.map(t => (t._1, t._4)) == Seq((0, 3L)))
  }

  test("nulls are excluded; empty bins emit no row") {
    val df = Seq(Some(0.0), None, Some(0.1), Some(10.0)).toDF("v")
    val got = Profiler.histogram(df, "v", nBins = 5)
      .orderBy("bin")
      .as[(Int, java.math.BigDecimal, java.math.BigDecimal, Long)]
      .collect().toSeq
    // 0.0 and 0.1 in bin 0, 10.0 in bin 4; bins 1-3 absent; null ignored
    assert(got.map(t => (t._1, t._4)) == Seq((0, 2L), (4, 1L)))
  }

  test("invalid arguments are rejected loudly") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Profiler.histogram(df, "v", nBins = 0)
    }
    intercept[IllegalArgumentException] {
      Profiler.histogram(df, "nope")
    }
  }
}
