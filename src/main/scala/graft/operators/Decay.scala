package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially-weighted (decayed) aggregates per key over an ordered
  * event stream — the recency-weighted engagement feature of a behavior
  * pipeline: recent events dominate, each step back decays by `1 - alpha`.
  *
  * Semantics: the standard recursive EWMA seeded on the oldest value,
  * `s_1 = v_1`, `s_t = alpha*v_t + (1-alpha)*s_(t-1)`, evaluated in closed
  * form as one weighted sum — `s_n = sum_t w_t * v_t` with
  * `w_t = alpha*(1-alpha)^(n-t)` for `t > 1` and `w_1 = (1-alpha)^(n-1)`.
  * Relationally that is: one window pass ranks events per key newest-first
  * (`row_number`), a second frame-less window sizes each key's kept tail,
  * and one groupBy folds the weighted sum — no UDAF, no driver state, the
  * shuffle classes of any windowed aggregation (both windows and the
  * groupBy share the key partitioning, so it is ONE exchange).
  *
  * `lastN` bounds the lookback (the seq2 window-tail posture): at scale it
  * caps per-key work regardless of a power user's history, and since
  * `(1-alpha)^lastN` is below double precision long before that matters,
  * the truncation error is negligible for any real decay. With
  * `1 - alpha` a power of two (e.g. alpha = 0.5) and 0/1 values, every
  * weight is a power of two and `lastN` ≤ ~50 keeps the whole sum exactly
  * representable — bit-identical across engines and reduction orders,
  * which is what makes the operator oracle-checkable (ew1).
  */
object Decay {

  /** Per-key EWMA of `valCol` over the `lastN` most recent events
    * (ordered by `orderCols`; make the order total — e.g. include a
    * unique id — or ranking is nondeterministic). Output: `keyCols` ++
    * (`ewma` DOUBLE, `n_events_used` BIGINT).
    */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           valCol: String, alpha: Double, lastN: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(lastN > 0, s"lastN must be positive: $lastN")
    val wRank = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val wKey = Window.partitionBy(keyCols.map(col): _*)
    val kept = df
      .withColumn("_ew_rn", row_number().over(wRank))
      .filter(col("_ew_rn") <= lastN)
      .withColumn("_ew_m", count(lit(1)).over(wKey))
    // rn = 1 is the NEWEST event: weight alpha*(1-alpha)^(rn-1); the
    // oldest kept row (rn = m) closes the recursion with (1-alpha)^(m-1)
    val weight =
      when(col("_ew_rn") === col("_ew_m"),
        pow(lit(1 - alpha), col("_ew_m") - 1))
        .otherwise(lit(alpha) * pow(lit(1 - alpha), col("_ew_rn") - 1))
    kept.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valCol) * weight).as("ewma"),
        count(lit(1)).cast("bigint").as("n_events_used"))
  }
}
