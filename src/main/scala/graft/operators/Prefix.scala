package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT running sum — the two-level prefix-sum that removes
  * the last single-task window from the per-group cumulative operators.
  *
  * `Window.partitionBy(group).orderBy(order)` with a running `sum()` is
  * one exchange, but it makes ONE TASK sort and scan an entire group —
  * with source-grain groups over a 100 TB corpus (one CommonCrawl-sized
  * source is the normal case) that task sorts terabytes. The classic
  * parallel-scan decomposition fixes it without changing a single output
  * bit for integral/decimal values:
  *
  *  1. band each group's rows by `percentile_approx` cuts over the order
  *     column — bands are order-monotone and equal-count-ish by
  *     construction (the cuts ADAPT to the distribution, unlike fixed
  *     range splits);
  *  2. per-(group, band) value sums, then the exclusive band prefix via
  *     a window over the G×B-row band table — metadata-class;
  *  3. running sum WITHIN each (group, band) partition plus the band's
  *     broadcast offset. Each task now sorts ~|group|/B rows.
  *
  * Exactness: every row in a strictly lower band has a strictly smaller
  * order value (a band is "count of cuts strictly below", a function of
  * the order value alone — duplicates never straddle bands), so
  * `offset(band) + local running sum` is term-for-term the global
  * running sum. Holds for ANY cut vector — `percentile_approx`'s
  * partition-order wobble moves band boundaries, never results (the
  * [[CorpusBudget.budgetFillByScore]] argument, reused for a running sum
  * instead of a selection). Integer/decimal sums are
  * association-insensitive so the regrouping is bit-exact; float sums
  * would re-associate (use decimal if that matters).
  *
  * Contract: `orderCol` must be numeric (the cuts are percentiles) and
  * should be unique per group — WITH duplicates, per-row totals among
  * tied rows are tie-order-arbitrary in the generic window too; this
  * form is no more and no less deterministic than it.
  */
object Prefix {

  /** `df` plus `outCol` = inclusive running sum of `valueCol` over
    * `orderCol` (ascending) within `groupCol`. `bands` bounds per-task
    * sort size at ~|group|/bands — size it to cluster parallelism.
    * Null values sum as ZERO (`outCol` is always defined) — the useful
    * contract for running token totals; callers needing SQL's
    * null-propagating window sum (null until the first non-null value)
    * use a generic window.
    */
  def runningSum(df: DataFrame, groupCol: String, orderCol: String,
                 valueCol: String, outCol: String,
                 bands: Int = 64): DataFrame = {
    require(bands >= 2 && bands <= 4096, s"bands out of range: $bands")
    (Seq("_ps_band", "_ps_cuts", "_ps_bs", "_ps_off", outCol)).foreach(r =>
      require(!df.columns.contains(r),
        s"runningSum: input already has a column named $r (reserved)"))
    val cuts = df.groupBy(col(groupCol)).agg(
      percentile_approx(
        col(orderCol),
        array((1 until bands).map(i => lit(i.toDouble / bands)): _*),
        lit(10000)).as("_ps_cuts"))
    val banded = df.join(broadcast(cuts), Seq(groupCol))
      .withColumn("_ps_band",
        coalesce(size(filter(col("_ps_cuts"), c => col(orderCol) > c)),
          lit(0)))
      .drop("_ps_cuts")
    // exclusive band prefix, lowest band first — G×B rows
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_ps_band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val zeroIfNull = coalesce(col(valueCol), lit(0L))
    val offsets = banded
      .groupBy(col(groupCol), col("_ps_band"))
      .agg(sum(zeroIfNull).as("_ps_bs"))
      .withColumn("_ps_off",
        coalesce(sum(col("_ps_bs")).over(wOff), lit(0L)))
      .select(col(groupCol), col("_ps_band"), col("_ps_off"))
    val wLocal = Window.partitionBy(col(groupCol), col("_ps_band"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offsets), Seq(groupCol, "_ps_band"))
      .withColumn(outCol,
        coalesce(sum(zeroIfNull).over(wLocal), lit(0L)) + col("_ps_off"))
      .drop("_ps_band", "_ps_off")
  }

  /** Distributed `row_number()` over (`score` ASC, tie-break…) within
    * `groupCol` — the [[runningSum]] decomposition with COUNTS for
    * values: band by score percentiles, per-band counts give each band's
    * exclusive rank offset, rank = band-local row_number + offset. Exact
    * for any cut vector (ties share a band; the tie-break totalizes the
    * order within it); each task sorts ~|group|/bands rows. `score` must
    * be numeric; rows are ranked ascending with nulls first — matching
    * `Window.orderBy(score, ties…)`.
    */
  def rankByScore(df: DataFrame, groupCol: String, score: Column,
                  tieBreak: Seq[Column], outCol: String,
                  bands: Int = 64): DataFrame = {
    require(bands >= 2 && bands <= 4096, s"bands out of range: $bands")
    (Seq("_ps_score", "_ps_band", "_ps_cuts", "_ps_bc", "_ps_off", outCol))
      .foreach(r => require(!df.columns.contains(r),
        s"rankByScore: input already has a column named $r (reserved)"))
    val scored = df.withColumn("_ps_score", score)
    val cuts = scored.groupBy(col(groupCol)).agg(
      percentile_approx(
        col("_ps_score"),
        array((1 until bands).map(i => lit(i.toDouble / bands)): _*),
        lit(10000)).as("_ps_cuts"))
    val banded = scored.join(broadcast(cuts), Seq(groupCol))
      .withColumn("_ps_band",
        coalesce(size(filter(col("_ps_cuts"), c => col("_ps_score") > c)),
          lit(0)))
      .drop("_ps_cuts")
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_ps_band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded
      .groupBy(col(groupCol), col("_ps_band"))
      .agg(count(lit(1)).as("_ps_bc"))
      .withColumn("_ps_off",
        coalesce(sum(col("_ps_bc")).over(wOff), lit(0L)))
      .select(col(groupCol), col("_ps_band"), col("_ps_off"))
    val wLocal = Window.partitionBy(col(groupCol), col("_ps_band"))
      .orderBy(col("_ps_score") +: tieBreak: _*)
    banded.join(broadcast(offsets), Seq(groupCol, "_ps_band"))
      .withColumn(outCol,
        (row_number().over(wLocal).cast("bigint") + col("_ps_off")))
      .drop("_ps_band", "_ps_off", "_ps_score")
  }

  /** Distributed `ntile(k)` over (`score` ASC, tie-break…) within
    * `groupCol`: [[rankByScore]] plus a broadcast per-group count and
    * the SQL NTILE assignment computed from (rank, n, k) — the first
    * `n mod k` buckets get `n div k + 1` rows, the rest `n div k`
    * (bit-equal to the window `ntile`, spec-asserted). The scale form of
    * per-stratum quantile binning when strata are source-grain.
    */
  def ntileByScore(df: DataFrame, groupCol: String, score: Column,
                   tieBreak: Seq[Column], k: Int, outCol: String,
                   bands: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Seq("_ps_n", "_ps_rank", "_ps_base", "_ps_small", "_ps_cutoff")
      .foreach(r => require(!df.columns.contains(r),
        s"ntileByScore: input already has a column named $r (reserved)"))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_ps_n"))
    // integer `div` throughout (Column./ is DOUBLE division); when
    // n < k the when-branch always fires (cutoff = n), so the
    // otherwise-branch's div-by-zero is never evaluated
    rankByScore(df, groupCol, score, tieBreak, "_ps_rank", bands)
      .join(broadcast(counts), Seq(groupCol))
      .withColumn("_ps_base", expr(s"_ps_n div ${k}L"))
      .withColumn("_ps_small", col("_ps_n") % k)
      .withColumn("_ps_cutoff", col("_ps_small") * (col("_ps_base") + 1L))
      .withColumn(outCol,
        when(col("_ps_rank") <= col("_ps_cutoff"),
          expr("(_ps_rank - 1) div (_ps_base + 1) + 1"))
          .otherwise(
            expr("_ps_small + (_ps_rank - _ps_cutoff - 1) div _ps_base + 1"))
          .cast("int"))
      .drop("_ps_rank", "_ps_n", "_ps_base", "_ps_small", "_ps_cutoff")
  }
}
