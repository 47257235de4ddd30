package graft.operators

import graft.SparkSpec

class DecaySpec extends SparkSpec {
  import spark.implicits._

  // (user, t, v): recursive EWMA with s1 = v1, st = α·vt + (1-α)·s(t-1)
  private val rows = Seq(
    ("u1", 1L, 1.0), ("u1", 2L, 0.0), ("u1", 3L, 1.0),
    ("u2", 1L, 1.0))

  test("hand-computed EWMA matches the recursive definition") {
    // u1, α=0.5: s1=1, s2=0.5, s3=0.75; u2: single event → its value
    val got = Decay.ewma(rows.toDF("user", "t", "v"),
        Seq("user"), Seq("t"), "v", alpha = 0.5, lastN = 10)
      .as[(String, Double, Long)].collect().map { case (u, e, n) => u -> ((e, n)) }.toMap
    assert(got == Map("u1" -> ((0.75, 3L)), "u2" -> ((1.0, 1L))))
  }

  test("lastN truncates to the newest events and restarts the recursion") {
    // u1 tail-2 keeps (t=2, v=0) and (t=3, v=1): s = 0.5·1 + 0.5·0 = 0.5
    val got = Decay.ewma(rows.toDF("user", "t", "v"),
        Seq("user"), Seq("t"), "v", alpha = 0.5, lastN = 2)
      .as[(String, Double, Long)].collect().map { case (u, e, n) => u -> ((e, n)) }.toMap
    assert(got("u1") == ((0.5, 2L)))
    assert(got("u2") == ((1.0, 1L)))
  }

  test("alpha = 1 keeps only the newest value") {
    val got = Decay.ewma(rows.toDF("user", "t", "v"),
        Seq("user"), Seq("t"), "v", alpha = 1.0, lastN = 10)
      .as[(String, Double, Long)].collect().map { case (u, e, n) => u -> e }.toMap
    assert(got("u1") == 1.0) // newest is v=1 at t=3
  }

  test("weights sum to one: EWMA of a constant is that constant") {
    val const = Seq.tabulate(20)(i => ("u", i.toLong, 3.0))
    val got = Decay.ewma(const.toDF("user", "t", "v"),
        Seq("user"), Seq("t"), "v", alpha = 0.25, lastN = 50)
      .as[(String, Double, Long)].collect().head
    assert(math.abs(got._2 - 3.0) < 1e-12 && got._3 == 20L)
  }

  test("invalid parameters are rejected loudly") {
    val df = rows.toDF("user", "t", "v")
    intercept[IllegalArgumentException] {
      Decay.ewma(df, Seq("user"), Seq("t"), "v", alpha = 0.0, lastN = 5)
    }
    intercept[IllegalArgumentException] {
      Decay.ewma(df, Seq("user"), Seq("t"), "v", alpha = 0.5, lastN = 0)
    }
  }
}
