package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training: assign documents to fixed-token-budget
  * packs (context windows) so a trainer reads pre-grouped batches instead
  * of packing on the fly.
  *
  * The rule is *contiguous cumulative packing*: within a group, docs are
  * taken in id order and `pack_id = (running token total before the doc)
  * div capacity`. A pack can overrun capacity by at most one document —
  * the standard streaming-packing tradeoff — in exchange for a rule that
  * is a pure window cumsum: deterministic, engine-portable (plain SQL
  * window), and shuffle-bounded.
  *
  * Scale: the window partitions by `groupCol` (e.g. source or a coarse
  * range bucket of the id), so state per task is one group, not the
  * corpus; packing the whole corpus through one unpartitioned window would
  * serialize on a single task at 100 TB and is deliberately not offered.
  * Integer division on the BIGINT cumsum keeps it exact (no FP rounding at
  * petabyte token counts).
  */
object Packing {

  def packContiguous(df: DataFrame, groupCol: String, idCol: String,
                     tokenCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)).cast("bigint"))
      .withColumn("pack_id", expr(s"cum_before div ${capacity}L").cast("bigint"))
      .drop("cum_before")
  }

  /** [[packContiguous]] with the running total computed by
    * [[Prefix.runningSum]] — bit-identical pack ids (integer arithmetic
    * throughout; the prefix decomposition is exact — see [[Prefix]]),
    * but each task sorts ~|group|/bands rows instead of a whole group.
    * The scale posture when groups are source-grain: [[packContiguous]]'s
    * own scaladoc steers large groups to "a coarse range bucket of the
    * id" — this IS that bucketing, made automatic (percentile cuts adapt
    * to the id distribution) and exact, instead of hand-chosen.
    */
  def packScaled(df: DataFrame, groupCol: String, idCol: String,
                 tokenCol: String, capacity: Long,
                 bands: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    Prefix.runningSum(df, groupCol, idCol, tokenCol, "_pk_run", bands)
      // exclusive total = inclusive minus own tokens; coalesce keeps a
      // null-token row at its predecessors' total (sum() skips nulls),
      // matching the generic window's 1-PRECEDING frame exactly
      .withColumn("cum_before",
        (col("_pk_run") - coalesce(col(tokenCol), lit(0L))).cast("bigint"))
      .withColumn("pack_id", expr(s"cum_before div ${capacity}L").cast("bigint"))
      .drop("cum_before", "_pk_run")
  }
}
