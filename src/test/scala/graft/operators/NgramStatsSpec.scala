package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramStatsSpec extends SparkSpec {
  import spark.implicits._

  test("bigrams are adjacent pairs; short docs yield none") {
    val got = Seq("a b c d", "solo", "").toDF("text")
      .select(NgramStats.bigrams($"text")).as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1) == Nil)
    assert(got(2) == Nil)
  }

  test("repetition stats: top and duplicate fractions") {
    // "x y x y x" → bigrams: x y, y x, x y, y x → top_frac 0.5, dup 0.5
    val df = Seq((1L, "x y x y x"), (2L, "a b c"), (3L, "one"))
      .toDF("doc_id", "text")
    val rows = NgramStats.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(rows == Seq((1L, 4L, 0.5, 0.5), (2L, 2L, 0.5, 0.0)))
    // doc 3 has <2 tokens → excluded entirely
  }

  test("topTokens ranks by count desc then token, k rows") {
    val df = Seq("b b b a a c", "a d").toDF("text")
    val rows = NgramStats.topTokens(df, "text", k = 3)
      .as[(String, Long, Int)].collect().toSeq
    assert(rows == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 1L, 3)))
  }

  test("mean token frequency: common words score high, hand-computed") {
    // corpus counts: a=2, b=2, z=1. doc1 "a b a": (2+2+2)/3; doc2 "z b": (1+2)/2
    val df = Seq((1L, "a b a"), (2L, "z b")).toDF("doc_id", "text")
    val got = NgramStats.meanTokenFrequency(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 2.0), (2L, 2L, 1.5)))
  }

  test("topTokens plan is TakeOrderedAndProject, not a global sort") {
    val df = Seq("a b c").toDF("text")
    val plan = NgramStats.topTokens(df, "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("divergence of identical slices is exactly zero") {
    val df = Seq(("a b c", "p"), ("a b c", "q")).toDF("text", "source")
    val row = NgramStats.tokenDivergence(df, "text", "source", "p", "q")
      .as[(Long, Double, Double)].collect().head
    // equal counts and totals per term → every ln ratio is ln(1) = 0.0
    assert(row == ((3L, 0.0, 0.0)))
  }

  test("disjoint vocabularies diverge positively in both directions") {
    val df = Seq(("a a b", "p"), ("x y z", "q")).toDF("text", "source")
    val (v, pq, qp) = NgramStats.tokenDivergence(df, "text", "source", "p", "q")
      .as[(Long, Double, Double)].collect().head
    assert(v == 5L, "union vocabulary")
    assert(pq > 0 && qp > 0)
  }

  test("divergence is direction-sensitive on skewed counts") {
    // p is concentrated on 'a'; q spreads evenly — KL(p‖q) ≠ KL(q‖p)
    val df = Seq(("a a a a b", "p"), ("a b a b a", "q")).toDF("text", "source")
    val (_, pq, qp) = NgramStats.tokenDivergence(df, "text", "source", "p", "q")
      .as[(Long, Double, Double)].collect().head
    assert(pq != qp)
  }
}
