package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkerCountSpec extends SparkSpec {
  import spark.implicits._

  private val markers = Seq("the", "a", "of", "and")

  private def native(s: String): Int =
    Seq(Tuple1(s)).toDF("t")
      .select(MarkerCount.markerCount($"t", markers)).as[Int].head()

  test("edge cases match split-on-single-space semantics") {
    assert(native("the cat and the hat") == 3)
    assert(native("THE A of") == 3)            // lower() applied
    assert(native("a  the") == 2)              // empty mid-segment ignored
    assert(native("the ") == 1)                // trailing empty segment
    assert(native("") == 0)
    assert(native("théâtre the café") == 1)    // multibyte chars don't split
    assert(native("other words only") == 0)
    assert(native("thea the") == 1)            // whole-segment match only
  }

  test("equivalent to the declarative HOF form on the harness corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        MarkerCount.markerCount($"text", markers).as("fast"),
        TextAnalysis.markerCountDeclarative($"text", markers).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("language id is unchanged by the native swap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // recompute languageId with the declarative counter and compare
    val scoredRef = {
      val m = TextAnalysis.DefaultLangMarkers.toSeq.sortBy(_._1).map {
        case (lang, words) => struct(
          TextAnalysis.markerCountDeclarative($"text", words).as("score"),
          lit(lang).as("lang"))
      }
      val best = element_at(array_sort(array(m: _*)), -1)
      when(best.getField("score") === 0, lit("und"))
        .otherwise(best.getField("lang"))
    }
    val diff = docs.select(TextAnalysis.languageId($"text").as("fast"),
        scoredRef.as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("Scala Column API fails fast on null or non-lowercase markers") {
    // same validation as the SQL build path, hoisted into the case class
    val e1 = intercept[IllegalArgumentException] {
      MarkerCount.markerCount($"t", Seq("the", null))
    }
    assert(e1.getMessage.contains("null"))
    val e2 = intercept[IllegalArgumentException] {
      MarkerCount.markerCount($"t", Seq("The"))
    }
    assert(e2.getMessage.contains("lowercase"))
  }

  test("null input yields null, and codegen path agrees with eval") {
    val df = Seq(Some("the a"), None).toDF("t")
    val got = df.select(MarkerCount.markerCount($"t", markers)).collect()
    assert(got(0).getInt(0) == 2 && got(1).isNullAt(0))
  }
}
