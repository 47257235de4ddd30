package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Theta sketches: partition-merge invariance, exact-mode equality with
  * true counts, and intersection/union correctness on planted sets.
  */
class ThetaSpec extends SparkSpec {
  import spark.implicits._

  test("planted sets: intersection and union estimates are exact below 2^lgK") {
    // A = [0, 1000), B = [600, 1600) → |A∩B| = 400, |A∪B| = 1600
    val df = ((0L until 1000L).map(("a", _)) ++
      (600L until 1600L).map(("b", _))).toDF("grp", "k")
    val sk = ThetaSketches.groupSketches(df, "grp", "k")
    assert(sk("a").getEstimate == 1000.0)
    assert(sk("b").getEstimate == 1000.0)
    assert(ThetaSketches.intersectionEstimate(sk("a"), sk("b")) == 400.0)
    assert(ThetaSketches.unionEstimate(sk("a"), sk("b")) == 1600.0)
  }

  test("estimates are partitioning-invariant (merge order can't matter)") {
    val df = (0L until 3000L).map(("g", _)).toDF("grp", "k")
    val e1 = ThetaSketches.groupSketches(df.repartition(1), "grp", "k")("g")
      .getEstimate
    val e32 = ThetaSketches.groupSketches(df.repartition(32), "grp", "k")("g")
      .getEstimate
    assert(e1 == e32)
    assert(e1 == 3000.0) // still in exact mode at lgK=12
  }

  test("harness events: sketch overlap == exact overlap in exact mode") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val sk = ThetaSketches.groupSketches(e, "event_type", "user_id")
    val du = e.select($"event_type", $"user_id").distinct()
    val exact = du.as("a")
      .join(du.as("b"), col("a.user_id") === col("b.user_id")
        && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type"), col("b.event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (ta, tb, n) =>
      assert(ThetaSketches.intersectionEstimate(sk(ta), sk(tb)) == n.toDouble,
        s"$ta ∩ $tb")
    }
  }
}
