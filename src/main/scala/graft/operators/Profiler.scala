package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality dashboard query run on every ingest:
  * per column, row count, null count and distinct count, in ONE
  * aggregation (the per-column report rows explode out of the single
  * result row, the FilterFunnel shape).
  *
  * Exact distinct counts rewrite into Spark's Expand-based multi-distinct
  * plan: one shuffle carrying rows × profiled-columns — fine for a
  * profile run, and the numbers are oracle-checkable. At 100TB pass
  * `approx = true`: HLL++ sketches replace the Expand (single pass, no
  * row multiplication) at 2% relative standard deviation (passed
  * explicitly below), the standard profiler trade.
  */
object Profiler {

  // backtick-quote so a column literally named "a.b" profiles as itself
  // instead of parsing as nested-field access (and the derived agg names
  // round-trip safely)
  private def q(n: String): String = s"`${n.replace("`", "``")}`"

  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approx: Boolean = false): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    names.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = count(lit(1)).cast("bigint").as("_rows") +: names.flatMap { c =>
      Seq(
        sum(when(col(q(c)).isNull, 1L).otherwise(0L)).cast("bigint")
          .as(s"_nulls_$c"),
        (if (approx) approx_count_distinct(col(q(c)), rsd = 0.02)
         else countDistinct(col(q(c))))
          .cast("bigint").as(s"_dist_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val reportRows = names.map { c =>
      struct(lit(c).as("column"), col("_rows").as("n_rows"),
        col(q(s"_nulls_$c")).as("n_nulls"),
        col(q(s"_dist_$c")).as("n_distinct"))
    }
    one.select(explode(array(reportRows: _*)).as("r")).select("r.*")
  }

  /** Fixed-width histogram of a numeric column — the distribution half of
    * the profile (the counts above say how many; this says where).
    * `nBins` equal-width bins over the observed [min, max]; the top edge
    * is inclusive (the max lands in the last bin, the standard
    * right-closed-last-bin convention). NULLs are excluded (they're
    * already counted by [[profile]]). Bins with no rows emit no row.
    *
    * Two aggregations: one for (min, max) — broadcast as a single row —
    * and the binned groupBy (a ≤nBins-key shuffle with map-side combine).
    * Bounds and bin edges are plain double arithmetic in a fixed
    * evaluation order, so any engine reproduces the same bin for every
    * value (`bin = min(floor((x − lo) · nBins / (hi − lo)), nBins−1)`;
    * a constant column degenerates to the single bin 0).
    */
  def histogram(df: DataFrame, column: String, nBins: Int = 20): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    require(df.columns.contains(column), s"no such column: $column")
    val x = col(q(column)).cast("double")
    val bounds = df.filter(x.isNotNull)
      .agg(min(x).as("_h_lo"), max(x).as("_h_hi"))
    val spanned = df.filter(x.isNotNull).crossJoin(broadcast(bounds))
    val bin = when(col("_h_hi") === col("_h_lo"), lit(0))
      .otherwise(least(
        floor((x - col("_h_lo")) * nBins / (col("_h_hi") - col("_h_lo"))),
        lit(nBins - 1L)))
      .cast("int")
    spanned
      .groupBy(bin.as("bin"), col("_h_lo"), col("_h_hi"))
      .agg(count(lit(1)).cast("bigint").as("n"))
      .select(col("bin"),
        (col("_h_lo") + col("bin") * (col("_h_hi") - col("_h_lo")) / nBins)
          .cast("decimal(18,6)").as("bin_lo"),
        (col("_h_lo") + (col("bin") + 1) * (col("_h_hi") - col("_h_lo")) / nBins)
          .cast("decimal(18,6)").as("bin_hi"),
        col("n"))
  }
}
