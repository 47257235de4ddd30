package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped descriptive statistics with cross-engine-exact results.
  *
  * Built-in `corr`/`stddev` aggregates are NOT reproducible across engines
  * (Welford vs naive accumulation → different float error, different
  * reduction order). This operator instead aggregates the five moment sums
  * (Σx, Σy, Σxy, Σx², Σy²) as exact DECIMALs — reduction order can't
  * matter — and derives the statistic with a fixed chain of IEEE double
  * ops, so any ANSI engine emits the identical bits. One partial+final
  * aggregation, no extra pass.
  */
object Stats {

  // (18,6): per-row casts stay on Spark's Long-backed fast decimal path
  // (precision ≤ 18); the sum accumulator widens to (28,6) automatically.
  // Magnitude bound: per-row |value| < 10^12 — holds for the harness
  // columns (quantity ≤ 50, price ≤ ~10^5, products ≤ ~10^10).
  private def d(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Pearson correlation of (x, y) per group:
    * (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̄) · √(n·Σy² − Σy²̄)), all terms from
    * exact decimal sums cast to double once.
    */
  def groupedCorrelation(df: DataFrame, groupCol: String,
                         xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    // decimal_sum128, not the built-in sum (r20, guide §1.2): the moment
    // sums' running totals leave the compact-long decimal range within
    // ~1k rows (Σy² unscaled ≈ 10^16/row at scale 6), putting Spark's
    // Sum on a per-row BigDecimal add for the rest of the table —
    // measured 2/3 of this query at sf0.1. The 128-bit two-long
    // accumulator keeps every per-row add on primitive longs and is
    // bit-identical to Sum (same result type, same exact value, same
    // null semantics — DecimalSum128Spec pins it far past the compact
    // boundary).
    // The casts are PRE-PROJECTED below the aggregate: an aggregate
    // function's child is re-evaluated at every reference in its update
    // expressions (measured: the five casts inside the agg ran the query
    // 2-3× over the same casts evaluated once in a projection — for the
    // built-in Sum too, 2.83 s vs 1.66 s), and the double→decimal cast is
    // the allocation-heavy step (Decimal.fromDouble via BigDecimal).
    import graft.functions.DecimalSum128.decimalSum128
    val pre = df.select(col(groupCol), d(x).as("dx"), d(y).as("dy"),
      d(x * y).as("dxy"), d(x * x).as("dxx"), d(y * y).as("dyy"))
    val agg = pre.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      decimalSum128(col("dx")).as("sx"), decimalSum128(col("dy")).as("sy"),
      decimalSum128(col("dxy")).as("sxy"),
      decimalSum128(col("dxx")).as("sxx"), decimalSum128(col("dyy")).as("syy"))
    val n = col("n").cast("double")
    def dd(name: String) = col(name).cast("double")
    // Final value is rounded to 12 decimals: decimal→double of a LARGE sum
    // (raw units beyond 2^53) is correctly rounded in Spark but 1 ulp off
    // in engines that convert via int128→double→÷10^scale, so the raw
    // double chains can differ in the last ulp; 12 decimals (corr carries
    // ~8 significant digits here) absorbs that while staying exact to
    // convert back (raw units < 2^53 for |corr| ≤ 1).
    // Degenerate groups (constant x or y, single-row) have zero variance:
    // correlation is undefined → NULL. The guard is on the RADICANDS, not
    // the denominator: double rounding can push n·Σx²−(Σx)² a few ulps
    // NEGATIVE for a constant column (e.g. x=0.1, n=2 → −6.9e-18), where
    // sqrt yields NaN and — under Spark 4's default ANSI mode — the
    // decimal cast of NaN THROWS. `vx <= 0` catches the exact-zero, the
    // negative-residue, and the tiny-positive-garbage cases alike.
    val num = n * dd("sxy") - dd("sx") * dd("sy")
    val vx = n * dd("sxx") - dd("sx") * dd("sx")
    val vy = n * dd("syy") - dd("sy") * dd("sy")
    agg.select(col(groupCol), col("n").cast("bigint").as("n"),
      when(vx <= 0.0 || vy <= 0.0, lit(null))
        .otherwise((num / (sqrt(vx) * sqrt(vy)))
          .cast(DecimalType(18, 12)).cast("double"))
        .as("corr_xy"))
  }
}
