package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def entries(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, Long, Long)] =
    df.select(explode(col("sketch")).as("e"))
      .select("e.item", "e.count", "e.err")
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime (distinct ≤ capacity): counts exact, order-invariant") {
    val items = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"t$i"))
    val a = entries(HeavyHitters.sketch(
      items.toDF("x"), col("x"), capacity = 512))
    val b = entries(HeavyHitters.sketch(
      scala.util.Random.shuffle(items).toDF("x").repartition(7),
      col("x"), capacity = 512))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(a.map(e => e._1 -> e._2).toMap == exact)
    assert(a.forall(_._3 == 0L)) // no evictions → no error
    assert(a == b) // partitioning cannot change an exact sketch
  }

  test("eviction regime: items above n/m survive with bounded error") {
    // 10k observations, one hot item at 30% plus a long tail of singletons
    val hot = Seq.fill(3000)("HOT")
    val tail = (1 to 7000).map(i => s"tail$i")
    val df = scala.util.Random.shuffle(hot ++ tail).toDF("x").repartition(4)
    val m = 64
    val got = entries(HeavyHitters.sketch(df, col("x"), capacity = m))
    assert(got.size <= m)
    val hotEntry = got.find(_._1 == "HOT")
    // SpaceSaving guarantee: true count 3000 > n/m ≈ 156 ⇒ HOT is present,
    // reported count ∈ [true, true + err]
    assert(hotEntry.nonEmpty, s"hot item evicted: $got")
    val (_, c, e) = hotEntry.get
    assert(c >= 3000L && c - e <= 3000L, s"count $c err $e")
  }

  test("merge substitutes the absent side's minimum counter (mergeable bounds)") {
    val agg = new HeavyHitters.SpaceSavingAgg(2)
    // both sketches FULL at capacity 2 — absence may mean "evicted", so
    // the absent side contributes its min counter as count AND error
    val a = HeavyHitters.Sketch(20, Map("p" -> ((10L, 0L)), "q" -> ((5L, 1L))))
    val b = HeavyHitters.Sketch(8, Map("x" -> ((6L, 0L)), "q" -> ((2L, 0L))))
    val m = agg.merge(a, b)
    // x: (6+minA=5, 0+5) = (11,5); p: (10+minB=2, 0+2) = (12,2); q: (7,1)
    // truncated to capacity 2 by count: p, x
    assert(m.n == 28L)
    assert(m.entries == Map("p" -> ((12L, 2L)), "x" -> ((11L, 5L))))
    // a NON-full sketch's absences genuinely mean zero — no substitution
    val small = HeavyHitters.Sketch(3, Map("y" -> ((3L, 0L))))
    val m2 = agg.merge(small, b)
    assert(m2.entries("y") == ((3L + 2L, 0L + 2L))) // b full → min 2 added
    assert(m2.entries("x") == ((6L, 0L)))           // small not full → +0
  }

  test("null items are ignored, not counted or crashed on") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("x")
    val got = entries(HeavyHitters.sketch(df, col("x"), capacity = 8))
    assert(got.map(e => e._1 -> e._2).toMap == Map("a" -> 2L, "b" -> 1L))
  }
}
