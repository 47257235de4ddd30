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

  // --- StreamSummaryAgg: result-identical fast path -----------------------

  private def foldRef(items: Seq[String], m: Int): Seq[HeavyHitters.Entry] = {
    val agg = new HeavyHitters.SpaceSavingAgg(m)
    agg.finish(items.foldLeft(agg.zero)(agg.reduce))
  }

  private def foldFast(items: Seq[String], m: Int): Seq[HeavyHitters.Entry] = {
    val agg = new HeavyHitters.StreamSummaryAgg(m)
    agg.finish(items.foldLeft(agg.zero)(agg.reduce))
  }

  test("property: stream-summary == reference on random streams, both regimes") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val universe = 1 + rnd.nextInt(60)
      val len = 1 + rnd.nextInt(400)
      val m = 1 + rnd.nextInt(20) // often < universe → eviction regime
      // Zipf-ish skew: low ids much more frequent
      val stream = Seq.fill(len)(
        s"w${math.min(rnd.nextInt(universe), rnd.nextInt(universe))}")
      assert(foldFast(stream, m) == foldRef(stream, m),
        s"trial $trial (universe=$universe len=$len m=$m)")
    }
  }

  test("property: merge parity with the reference rule on split streams") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 30) {
      val m = 1 + rnd.nextInt(12)
      val mk = () => Seq.fill(1 + rnd.nextInt(200))(s"k${rnd.nextInt(40)}")
      val (s1, s2) = (mk(), mk())
      val ref = new HeavyHitters.SpaceSavingAgg(m)
      val fast = new HeavyHitters.StreamSummaryAgg(m)
      val refOut = ref.finish(ref.merge(
        s1.foldLeft(ref.zero)(ref.reduce), s2.foldLeft(ref.zero)(ref.reduce)))
      val fastOut = fast.finish(fast.merge(
        s1.foldLeft(fast.zero)(fast.reduce),
        s2.foldLeft(fast.zero)(fast.reduce)))
      assert(fastOut == refOut, s"trial $trial (m=$m)")
    }
  }

  test("fast path buffer survives its encoder round-trip inside Spark") {
    val hot = Seq.fill(500)("HOT")
    val tail = (1 to 2000).map(i => s"t$i")
    val df = scala.util.Random.shuffle(hot ++ tail).toDF("x").repartition(4)
    val fastRows = entries(
      HeavyHitters.sketch(df, col("x"), capacity = 32, fast = true))
    assert(fastRows.size <= 32)
    val hotE = fastRows.find(_._1 == "HOT")
    assert(hotE.nonEmpty, s"hot item evicted: $fastRows")
    assert(hotE.get._2 >= 500L && hotE.get._2 - hotE.get._3 <= 500L)
  }
}
