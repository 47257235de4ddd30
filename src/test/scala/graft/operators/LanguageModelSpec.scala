package graft.operators

import graft.SparkSpec

/** Bigram-LM scoring semantics: hand-computed smoothed probabilities on a
  * tiny corpus, short-doc exclusion, and the fluency ordering the filter
  * exists for (corpus-typical text scores lower surprisal than one-off
  * token soup).
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one surprisal on a tiny corpus") {
    // uni: a=3 b=2 c=1, V=3; bigrams: "a b" c12=2, "a c" c12=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"avg_surprisal", $"perplexity")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc1/doc2: p(b|a) = (2+1)/(3+3) = 1/2 → surprisal ln 2
    val ln2r = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc3: p(c|a) = (1+1)/(3+3) = 1/3 → surprisal ln 3
    val ln3r = BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L, 3L))
    Seq(1L, 2L).foreach { id =>
      assert(got(id)._2 == 1L)
      assert(math.abs(got(id)._3 - ln2r) <= 1e-6, s"doc $id: ${got(id)}")
      assert(math.abs(got(id)._4 - 2.0) <= 1e-5, s"doc $id ppl: ${got(id)}")
    }
    assert(math.abs(got(3L)._3 - ln3r) <= 1e-6)
    assert(math.abs(got(3L)._4 - 3.0) <= 1e-5)
  }

  test("docs with fewer than 2 tokens carry no bigram and are excluded") {
    val docs = Seq((1L, "hello"), (2L, "hello world")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("corpus-typical text scores lower surprisal than one-off tokens") {
    // ten copies of a stock phrase vs one doc of unique tokens
    val stock = (1L to 10L).map(i => (i, "the quick brown fox"))
    val docs = (stock :+ (99L, "zq xv kj wp")).toDF("doc_id", "text")
    val avg = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .select($"doc_id", $"avg_surprisal").as[(Long, Double)].collect().toMap
    assert(avg(1L) < avg(99L),
      s"stock ${avg(1L)} should be more predictable than soup ${avg(99L)}")
  }
}
