package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordsStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tf-idf: hand-computed log-idf scores and ranks") {
    // N=2. d1: a×2,b×1; d2: a×1,c×1. df: a=2,b=1,c=1.
    // score = tf·ln((N+1)/(df+1)), rounded to 6 decimals.
    // a: ln(3/3)=0 → every-doc terms score 0; b,c: ln(1.5)≈0.405465.
    // NOTE d1's top term is b, not a — the rational-idf variant ranked a
    // first (2·3/3=2 > 1.5); standard log-idf demotes corpus-wide terms.
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Keywords.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Int, Double)].collect().toSeq
    val ln15 = math.rint(math.log(1.5) * 1e6) / 1e6
    assert(got == Seq(
      (1L, "b", 1, ln15),  // 1 · ln(3/2)
      (1L, "a", 2, 0.0),   // 2 · ln(3/3) = 0
      (2L, "c", 1, ln15),  // 1 · ln(3/2)
      (2L, "a", 2, 0.0)))  // 1 · ln(3/3) = 0
  }

  test("df=N terms score exactly 0.0 and rank purely on the term tie-break") {
    // both terms appear in every doc → score = tf·ln(1) = 0.0 EXACTLY for
    // all of them (the one non-transcendental log-idf output); the rank
    // must come from the deterministic term tie-break alone, identically
    // in any engine
    val df = Seq((1L, "y x"), (2L, "x y y")).toDF("doc_id", "text")
    val got = Keywords.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Int, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "x", 1, 0.0), (1L, "y", 2, 0.0),
      (2L, "x", 1, 0.0), (2L, "y", 2, 0.0)))
  }

  test("correlation: ±1 on perfectly linear data (within one sqrt ulp)") {
    // the value is DETERMINISTIC (that's the operator's contract — both
    // engines emit identical bits); it is not mathematically exact: the
    // final sqrt/division chain rounds, so ±1 comes back as 1±2e-16
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
      ("h", 1.0, -2.0), ("h", 2.0, -4.0), ("h", 3.0, -6.0))
      .toDF("grp", "x", "y")
    val got = Stats.groupedCorrelation(df, "grp", "x", "y")
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("g", "h") && got.map(_._2) == Seq(3L, 3L))
    assert(math.abs(got(0)._3 - 1.0) < 1e-12, got(0).toString)
    assert(math.abs(got(1)._3 + 1.0) < 1e-12, got(1).toString)
  }

  test("degenerate groups (constant column, single row) yield NULL not a crash") {
    // under default ANSI mode the unguarded NaN→DECIMAL cast would throw
    val df = Seq(("const", 1.0, 5.0), ("const", 2.0, 5.0),
      ("single", 3.0, 4.0)).toDF("grp", "x", "y")
    val got = Stats.groupedCorrelation(df, "grp", "x", "y")
      .orderBy("grp").collect()
    assert(got.length == 2)
    assert(got.forall(_.isNullAt(2)), got.mkString(","))
  }

  test("non-dyadic constant column: negative rounding residue → NULL, no throw") {
    // x = 0.1 constant, n = 2: n·Σx²−(Σx)² lands a few ulps NEGATIVE in
    // doubles; an unguarded sqrt(NaN) path would throw on the ANSI cast
    val df = Seq(("g", 0.1, 1.0), ("g", 0.1, 2.0)).toDF("grp", "x", "y")
    val got = Stats.groupedCorrelation(df, "grp", "x", "y").collect()
    assert(got.length == 1 && got.head.isNullAt(2), got.mkString(","))
  }

  test("correlation is layout-invariant (decimal moment sums)") {
    val rows = (0 until 500).map(i =>
      ("g", (i % 37) * 1.25, ((i * 13) % 41) * 0.75))
    val a = Stats.groupedCorrelation(rows.toDF("grp", "x", "y"),
      "grp", "x", "y").as[(String, Long, Double)].head()
    val b = Stats.groupedCorrelation(
        scala.util.Random.shuffle(rows).toDF("grp", "x", "y").repartition(7),
        "grp", "x", "y").as[(String, Long, Double)].head()
    assert(a == b)
    assert(a._3 >= -1.0 && a._3 <= 1.0)
  }
}
