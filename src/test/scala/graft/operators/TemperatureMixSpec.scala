package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temperature-mix semantics: thresholds follow the n^α share formula
  * with the min(1, ·) cap, tail sources are favored relative to head
  * sources, α=1/targetFrac=1 is the identity, and the kept set is the
  * deterministic md5-bucket cut at the computed threshold.
  */
class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  // head source A: 90 rows, tail source B: 10 rows
  private lazy val df =
    ((0L until 90L).map(i => (i, "A")) ++ (100L until 110L).map(i => (i, "B")))
      .toDF("doc_id", "source")

  test("kept set equals the hand-computed threshold cut") {
    // sqrt(90), sqrt(10) rounded to 6dp; z exact decimal sum; thresholds:
    // A: min(1, 0.5·100·(sqA/z)/90)·100 ; B capped at 1 → 100 (all kept)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val sqA = r6(math.sqrt(90.0)); val sqB = r6(math.sqrt(10.0))
    val z = (sqA + sqB).toDouble
    val thrA = r6(math.min(1.0,
      (0.5 * 100.0 * (sqA.toDouble / z)) / 90.0) * 100.0).toDouble
    val thrB = r6(math.min(1.0,
      (0.5 * 100.0 * (sqB.toDouble / z)) / 10.0) * 100.0).toDouble
    assert(thrB == 100.0, "tail source is capped at keep-everything")

    val buckets = df
      .withColumn("b", Splits.bucket($"doc_id"))
      .select($"doc_id", $"source", $"b")
      .as[(Long, String, Long)].collect()
    val expected = buckets.collect {
      case (id, "A", b) if b.toDouble < thrA => id
      case (id, "B", b) if b.toDouble < thrB => id
    }.toSet
    val got = Splits.temperatureMix(df, "doc_id", "source")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert((100L until 110L).toSet.subsetOf(got), "all of B kept")
  }

  test("tail keep-rate exceeds head keep-rate (the point of temperature)") {
    val kept = Splits.temperatureMix(df, "doc_id", "source")
      .groupBy($"source").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    assert(kept("B").toDouble / 10.0 > kept("A").toDouble / 90.0)
  }

  test("alpha=1, targetFrac=1 keeps every row") {
    val got = Splits.temperatureMix(df, "doc_id", "source",
      alpha = 1.0, targetFrac = 1.0)
    assert(got.count() == df.count())
  }
}
