package graft.operators

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("a")),
    (Some(2L), None), (None, Some("b")))
    .toDF("id", "s")

  test("per-column row/null/distinct counts, one row per column") {
    val got = Profiler.profile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "id" -> ((4L, 1L, 2L)), // distinct excludes nulls: {1,2}
      "s" -> ((4L, 1L, 2L)))) // {a,b}
  }

  test("column subset and approx mode") {
    val got = Profiler.profile(df, cols = Seq("s"), approx = true)
      .as[(String, Long, Long, Long)].head()
    assert(got._1 == "s" && got._2 == 4L && got._3 == 1L)
    assert(got._4 >= 1L && got._4 <= 3L) // HLL estimate of 2, tiny n → exact-ish
  }

  test("unknown column fails loudly") {
    intercept[IllegalArgumentException] {
      Profiler.profile(df, cols = Seq("nope"))
    }
  }
}
