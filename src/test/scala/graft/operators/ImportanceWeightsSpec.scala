package graft.operators

import graft.SparkSpec

/** DSIR importance-weight semantics: hand-computed smoothed log-ratios,
  * sign of the keep flag, and target-typical text outranking off-target
  * text.
  */
class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  private def r12(x: Double) =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed weights on a two-token universe") {
    // vocab: aa (ct=2, cr=0), bb (ct=0, cr=2); nt=nr=2, V=2
    // p_T(aa)=3/4 p_R(aa)=1/4 → ln 3; p_T(bb)=1/4 p_R(bb)=3/4 → ln(1/3)
    val docs = Seq((1L, "aa aa", "tgt"), (2L, "bb bb", "raw"))
      .toDF("doc_id", "text", "source")
    val got = ImportanceWeights.logImportanceWeights(docs, "doc_id", "text",
      "source", "tgt")
      .select($"doc_id", $"n_tokens", $"log_weight", $"keep")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - 2 * r12(math.log(3.0))) < 1e-9)
    assert(got(1L)._4, "target-typical doc kept")
    assert(math.abs(got(2L)._3 - 2 * r12(math.log(1.0 / 3.0))) < 1e-9)
    assert(!got(2L)._4, "off-target doc dropped")
  }

  test("target-like raw docs outrank off-target raw docs") {
    val target = (1L to 5L).map(i => (i, "alpha beta gamma", "tgt"))
    val rawLike = (10L, "alpha beta gamma", "raw")
    val rawOff = (11L, "zeta eta theta", "raw")
    val docs = (target :+ rawLike :+ rawOff).toDF("doc_id", "text", "source")
    val w = ImportanceWeights.logImportanceWeights(docs, "doc_id", "text",
      "source", "tgt")
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().toMap
    assert(w(10L) > w(11L),
      s"target-like ${w(10L)} must outrank off-target ${w(11L)}")
  }
}
