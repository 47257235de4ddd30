package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructField, StructType, StringType}
import org.apache.spark.sql.Row

import DecimalSum128.decimalSum128

/** [[DecimalSum128]] must be BIT-IDENTICAL to the built-in `sum` over
  * compact decimals — same result type, same exact value, same null
  * semantics — specifically on sums far past the compact-long unscaled
  * boundary (|unscaled| ≥ 2^63), where the built-in switches to its
  * per-row BigDecimal path and this aggregate's two-long carry math is
  * the part that has to be right.
  */
class DecimalSum128Spec extends SparkSpec {
  import spark.implicits._

  private def compare(values: Seq[Option[BigDecimal]], scale: Int): Unit = {
    val dec = DecimalType(18, scale)
    val rows = values.map(v => Row(v.map(_.setScale(scale)).orNull))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r), 4),
      StructType(Seq(StructField("v", dec, nullable = true))))
    val got = df.agg(decimalSum128(col("v")).as("s"))
    val want = df.agg(sum(col("v")).as("s"))
    assert(got.schema == want.schema,
      s"schema: ${got.schema} vs ${want.schema}")
    val g = got.collect()(0).get(0)
    val w = want.collect()(0).get(0)
    assert(g == w, s"value: $g vs builtin $w")
  }

  test("random sums crossing the compact-long boundary, both signs") {
    val rnd = new scala.util.Random(7)
    // 18-digit-magnitude values: the running sum leaves the compact
    // range after ~10 rows and ends around ±10^21 (24 digits unscaled)
    val big = (1 to 5000).map { _ =>
      val intPart = (rnd.nextLong() % 1000000000000L).abs *
        (if (rnd.nextBoolean()) 1 else -1)
      Some(BigDecimal(BigInt(intPart)) +
        BigDecimal(BigInt(rnd.nextInt(1000000)), 6))
    }
    compare(big, 6)
    // mostly-positive drift (the stat1 shape: squares are nonnegative)
    compare((1 to 5000).map(_ =>
      Some(BigDecimal(BigInt((rnd.nextLong() % 100000000000000L).abs), 2))), 2)
  }

  test("nulls skipped; all-null and empty groups are null") {
    compare(Seq(Some(BigDecimal(1.5)), None, Some(BigDecimal(-2.25)), None), 6)
    compare(Seq(None, None, None), 6)
    compare(Seq.empty, 6)
  }

  test("grouped parity on a keyed frame with skewed magnitudes") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 20000).map { i =>
      (s"g${i % 7}", BigDecimal(BigInt(rnd.nextLong() % 100000000000L), 6))
    }
    val df = rows.toDF("k", "raw")
      .select(col("k"), col("raw").cast(DecimalType(18, 6)).as("v"))
    val got = df.groupBy("k").agg(decimalSum128(col("v")).as("s"))
    val want = df.groupBy("k").agg(sum(col("v")).as("s"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "grouped sums differ from builtin")
  }

  test("BIGINT child: parity with sum(cast(decimal(38,0))) on full-range " +
      "longs (the fingerprint shape)") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 4000).map(_ => rnd.nextLong()) // full int64 range
    val df = rows.toDF("h")
    val got = df.agg(decimalSum128(col("h")).as("s"))
    val want = df.agg(sum(col("h").cast(DecimalType(38, 0))).as("s"))
    assert(got.schema == want.schema,
      s"schema: ${got.schema} vs ${want.schema}")
    assert(got.collect()(0).getDecimal(0) == want.collect()(0).getDecimal(0))
    // empty relation → null, like the builtin
    val empty = df.filter(lit(false)).agg(decimalSum128(col("h")))
    assert(empty.collect()(0).isNullAt(0))
  }

  test("refuses non-compact input types") {
    val df = Seq(BigDecimal(1)).toDF("v")
      .select(col("v").cast(DecimalType(38, 6)).as("v"))
    val e = intercept[Exception] {
      df.agg(decimalSum128(col("v"))).collect()
    }
    assert(e.getMessage.contains("decimal_sum128") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }
}
