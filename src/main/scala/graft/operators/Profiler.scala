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
}
