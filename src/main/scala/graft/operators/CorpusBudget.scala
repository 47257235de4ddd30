package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "fill N tokens per source, best docs
  * first": the assembly step of a training mix, after scoring and before
  * packing. Docs are ranked inside each group by the given order and kept
  * while the RUNNING token total (including the current doc) stays within
  * the budget; the first doc of a group is always admitted even if it
  * alone overshoots (a budget that admits nothing is never useful).
  *
  * Scale shape: one hash-partitioned window per group (the same shuffle a
  * groupBy would pay), cumulative sum inside the partition, then a filter
  * — no second shuffle, no driver state. Ordering must be engine-stable
  * for reproducibility: pass pre-rounded / integer sort keys (see
  * `tb1_token_budget`, which orders by the DECIMAL(18,6)-rounded quality
  * with an id tie-break — the Keywords rank-parity argument).
  */
object CorpusBudget {

  /** Output carries the input columns plus `cum_tokens` (the running
    * within-group total that admitted each row) — both `cum_tokens` and
    * the internal `_bf_rn` are reserved names, rejected loudly on input
    * rather than silently overwritten.
    */
  def budgetFill(df: DataFrame, groupCol: String, tokensCol: String,
                 budget: Long, orderBy: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    Seq("_bf_rn", "cum_tokens").foreach(r =>
      require(!df.columns.contains(r),
        s"budgetFill: input already has a column named $r (reserved)"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // first-doc admission is by RANK, not by `cum == own tokens` — the
    // latter also matches any doc whose higher-ranked predecessors sum to
    // zero tokens (empty documents), silently overshooting the budget
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("_bf_rn", row_number().over(ord))
      .filter(col("cum_tokens") <= budget || col("_bf_rn") === 1)
      .drop("_bf_rn")
  }
}
