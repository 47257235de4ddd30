package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("token counts and diversity") {
    val df = one("the cat the dog").select(
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.distinctTokenCount($"text").as("d"),
      TextAnalysis.lexicalDiversity($"text").as("r"))
    assert(df.as[(Int, Int, Double)].head() == ((4, 3, 0.75)))
  }

  test("BPE-ish estimate: ceil(len/4) per token") {
    // "internationalization" → ceil(20/4)=5; "a" → 1; "cats" → 1
    val n = one("internationalization a cats")
      .select(TextAnalysis.estimatedBpeTokens($"text")).as[Long].head()
    assert(n == 7L)
  }

  test("language id picks max marker score, und on zero") {
    val got = Seq("the cat and the hat", "der hund und die katze",
      "le chat et la maison", "el gato y los perros", "qwerty zxcvb")
      .toDF("text")
      .select(TextAnalysis.languageId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint ignores order and repetition") {
    val fps = Seq("b a c", "c b a a a", "a b d").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("quality score stays in [0,1] on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mm = docs.select(TextAnalysis.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).as[(Double, Double)].head()
    assert(mm._1 >= 0.0 && mm._2 <= 1.0)
  }
}
