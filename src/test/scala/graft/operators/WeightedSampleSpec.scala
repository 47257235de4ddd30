package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted sampling (A-Res over md5 uniforms): structural invariants,
  * determinism, and the actual weight-proportionality it promises.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("structure: n per stratum, ranks contiguous, deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"source", $"n_chars")
    val s1 = Splits.weightedSample(docs, "source", "doc_id", "n_chars", 10)
    val bySrc = s1.groupBy($"source").agg(count(lit(1)).as("n"),
      max($"sample_rank").as("mx")).as[(String, Long, Int)].collect()
    bySrc.foreach { case (src, n, mx) =>
      assert(n <= 10 && mx == n, s"$src: n=$n maxRank=$mx")
    }
    val s2 = Splits.weightedSample(docs.repartition(17), "source", "doc_id",
      "n_chars", 10)
    assert(s1.select("doc_id", "sample_rank").collect().toSet ==
      s2.select("doc_id", "sample_rank").collect().toSet,
      "sample must be independent of partitioning")
  }

  test("non-positive weights are never preferred (null key ranks last)") {
    // a negative weight would flip ln(u)/w positive and rank FIRST if
    // passed through raw — the guard nulls it, so it fills only when
    // positive-weight rows run out
    val df = Seq((1L, "s", 5.0), (2L, "s", -3.0), (3L, "s", 0.0))
      .toDF("id", "stratum", "w")
    val one = Splits.weightedSample(df, "stratum", "id", "w", 1)
      .select($"id").as[Long].collect()
    assert(one.toSeq == Seq(1L), s"positive-weight row must win: ${one.toSeq}")
    val all = Splits.weightedSample(df, "stratum", "id", "w", 3)
      .orderBy($"sample_rank").select($"id").as[Long].collect()
    assert(all.head == 1L && all.toSet == Set(1L, 2L, 3L))
  }

  test("tiny weights don't overflow the decimal key (28,12 headroom)") {
    val df = Seq((1L, "s", 1e-6), (2L, "s", 1e-6), (3L, "s", 2e-6))
      .toDF("id", "stratum", "w")
    val out = Splits.weightedSample(df, "stratum", "id", "w", 3)
    assert(out.count() == 3) // at (18,12) these keys overflowed to null
  }

  test("weight-proportionality: heavy items dominate planted strata") {
    // 100 strata; in each, item 0 has weight 1000, items 1-9 weight 1.
    // A-Res: P(item 0 wins | n=1) = 1000/1009 ≈ 0.991 per stratum, so
    // ~99 of 100 strata should pick their heavy item (binomial tail
    // makes < 90 astronomically unlikely; deterministic given md5).
    val rows = for (s <- 0 until 100; i <- 0 until 10)
      yield (s.toLong * 100 + i, s"s$s", if (i == 0) 1000.0 else 1.0)
    val df = rows.toDF("id", "stratum", "w")
    val picked = Splits.weightedSample(df, "stratum", "id", "w", 1)
      .select($"id").as[Long].collect()
    val heavyWins = picked.count(_ % 100 == 0)
    assert(heavyWins >= 90, s"heavy item won only $heavyWins/100 strata")

    // and with uniform weights the heavy bias disappears: item 0 wins
    // ~10 of 100 (P = 1/10 each) — bound it loosely
    val uni = Splits.weightedSample(
      rows.map { case (id, s, _) => (id, s, 1.0) }.toDF("id", "stratum", "w"),
      "stratum", "id", "w", 1)
      .select($"id").as[Long].collect()
    val uniformWins = uni.count(_ % 100 == 0)
    assert(uniformWins <= 30, s"uniform weights should not favor item 0: " +
      s"$uniformWins/100")
  }
}
