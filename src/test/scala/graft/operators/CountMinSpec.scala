package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count–Min sketch: the SQL-aggregate-built sketch answers point queries
  * consistently with `estimateCount`, merged group sketches equal one
  * global sketch, and the one-sided CM guarantee holds vs exact counts.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("merged per-group sketches == exact counts on a sparse key space") {
    val e = spark.read.parquet(s"$sf/events.parquet")
    val sketches = CountMin.groupSketches(e, "event_type", "user_id")
    val exact = e.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val (est, bound) = CountMin.estimateKeys(sketches,
      exact.keys.toSeq)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CM must never underestimate: key $k")
      assert(est(k) <= n + bound, s"key $k: ${est(k)} > $n + $bound")
    }
    // width ≫ distinct keys here, so the estimates should be exact
    assert(exact.forall { case (k, n) => est(k) == n },
      "sparse key space: no collisions expected at width 2000")
  }

  test("merging group sketches == building one global sketch") {
    val e = spark.read.parquet(s"$sf/events.parquet")
    val grouped = CountMin.groupSketches(e, "event_type", "user_id")
      .select($"cms").as[Array[Byte]].collect().toIndexedSeq
    val global = CountMin.groupSketches(
      e.withColumn("one", lit(1)), "one", "user_id")
      .select($"cms").as[Array[Byte]].collect().toIndexedSeq
    val m = CountMin.mergeSketches(grouped)
    val g = CountMin.mergeSketches(global)
    assert(m.totalCount() == g.totalCount())
    (0L until 15L).foreach { k =>
      assert(m.estimateCount(Long.box(k)) == g.estimateCount(Long.box(k)))
    }
  }

  test("absent keys estimate near zero (bounded by ε·N)") {
    val e = spark.read.parquet(s"$sf/events.parquet")
    val sketches = CountMin.groupSketches(e, "event_type", "user_id")
    val (est, bound) = CountMin.estimateKeys(sketches,
      Seq(999999L, -5L))
    est.values.foreach(v => assert(v <= bound))
  }
}
