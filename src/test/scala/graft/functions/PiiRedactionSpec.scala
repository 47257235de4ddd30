package graft.functions

import graft.SparkSpec

class PiiRedactionSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(PiiRedaction.redactPii($"t")).as[String].head()

  test("emails, phones and IPs are each replaced") {
    assert(clean("mail bob.smith+x@corp.example.org now")
      == "mail <EMAIL> now")
    assert(clean("call +44-555-0199 today") == "call <PHONE> today")
    assert(clean("from 192.168.001.255 port") == "from <IP> port")
  }

  test("all three in one text; multiple occurrences all scrubbed") {
    assert(clean("a@b.co or c@d.org via 10.0.0.1 tel +1-555-0000")
      == "<EMAIL> or <EMAIL> via <IP> tel <PHONE>")
  }

  test("IPv4 word boundary: does not fire inside longer digit runs") {
    assert(clean("version 1.2.3.4567 stays") == "version 1.2.3.4567 stays")
    assert(clean("ip 1.2.3.45 goes") == "ip <IP> goes")
  }

  test("numeric email host: not an email (letter TLD required), IP still caught") {
    // "z9@10.0.0.99" fails the email pattern (TLD must be alphabetic),
    // but the IP pass still scrubs the address part.
    assert(clean("x z9@10.0.0.99 y") == "x z9@<IP> y")
  }

  test("clean text is untouched") {
    val s = "the quick brown fox at example dot com"
    assert(clean(s) == s)
  }

  test("redaction is idempotent on the harness corpus") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat($"text", lit(" x"), $"doc_id".cast("string"),
        lit("@y.com 10.1.2.3 +1-555-0101")).as("t"))
    val once = docs.select(PiiRedaction.redactPii($"t").as("r"))
    val twice = once.select(PiiRedaction.redactPii($"r").as("r"))
    assert(once.except(twice).count() == 0 && twice.except(once).count() == 0)
  }
}
