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
  * Scale shape — [[budgetFill]] vs [[budgetFillByScore]]: the generic
  * form pays one hash-partitioned window per group, which means ONE TASK
  * sorts an entire group — and the running-total filter sits on
  * `cum_tokens`, not a rank, so Spark's WindowGroupLimit pushdown cannot
  * truncate the sort the way it does for top-k windows. With a handful of
  * sources over a 100 TB corpus (one CommonCrawl-sized source is the
  * normal case) that is a single-task sort of terabytes: the same
  * driver-/task-concentration defect class as a collect(). Production
  * callers whose order is (numeric score DESC, tie-break) — every
  * token-budget call in this repo — should use [[budgetFillByScore]],
  * which histogram-prunes each group to a ~budget-sized survivor set
  * BEFORE the exact window. The generic form remains for arbitrary
  * orderings and is the spec-equality companion.
  *
  * Ordering must be engine-stable for reproducibility: pass pre-rounded /
  * integer sort keys (see `tb1_token_budget`, which orders by the
  * DECIMAL(18,6)-rounded quality with an id tie-break — the Keywords
  * rank-parity argument).
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

  /** [[budgetFill]] for the (score DESC, tie-break…) ordering, with a
    * histogram prune so the exact per-group window sorts a ~budget-sized
    * survivor set instead of the whole group — the 100 TB posture for
    * skewed groups (one source = most of the corpus).
    *
    * How: per group, `buckets-1` approximate score percentiles cut the
    * score range into `buckets` bands; per-(group, band) token sums give
    * the exclusive running total at each band boundary (a G×B-row frame —
    * metadata-class); every band whose exclusive prefix exceeds `budget`
    * is dropped WHOLE, and the exact [[budgetFill]] window runs on the
    * survivors. The prune is provably lossless for ANY cut vector, so
    * `percentile_approx`'s merge-order wobble cannot touch results —
    * cuts steer pruning efficiency only:
    *  - bands are a function of the score alone (count of cuts strictly
    *    below it), so equal scores share a band, and a strictly higher
    *    band means a strictly higher score — survivors are a prefix of
    *    the (score DESC, tie) order and their running totals match the
    *    unpruned ones exactly;
    *  - an admitted row's running total (≤ budget, tokens non-negative)
    *    is ≥ its band's exclusive prefix, so its band survives; the
    *    always-admitted rank-1 row sits in the top non-empty band, whose
    *    exclusive prefix is 0;
    *  - null scores land in band 0 (ranked last, matching DESC
    *    NULLS LAST) and a band-0 prune is justified by the same prefix
    *    argument; an all-null group yields null cuts → everyone in band
    *    0 → no pruning (graceful degradation, like an all-equal-score
    *    group).
    *
    * REQUIRES `tokensCol` non-negative (token counts are) — a negative
    * value breaks the prefix bound above; the generic [[budgetFill]] has
    * no such constraint. REQUIRES `score` deterministic: it is evaluated
    * in TWO separate passes (the cuts aggregation and the banding join),
    * so a nondeterministic score (e.g. rand-derived) would band against
    * stale cuts and silently void the losslessness proof — derive
    * pseudo-random scores from hashes of row identity (the ws1 pattern)
    * instead. Cost: one extra scan of `df` (the cuts pass
    * reads only group + score — column pruning keeps heavy derivations
    * like BPE counts out of it) plus two compact-key aggregations;
    * what it buys is never materializing, shuffling, or sorting the
    * non-contending bulk of each group.
    */
  def budgetFillByScore(df: DataFrame, groupCol: String, tokensCol: String,
                        budget: Long, score: Column, tieBreak: Seq[Column],
                        buckets: Int = 64): DataFrame =
    budgetFill(
      pruneByScore(df, groupCol, tokensCol, budget, score, buckets),
      groupCol, tokensCol, budget,
      orderBy = col("_bf_score").desc +: tieBreak)
      .drop("_bf_score")

  /** The prune stage of [[budgetFillByScore]], exposed for its spec:
    * returns the contending head of each group (every row the exact fill
    * could admit, plus at most one score band of slack), carrying the
    * materialized score as `_bf_score`. Lossless for any cut vector —
    * see [[budgetFillByScore]]'s proof sketch.
    */
  private[graft] def pruneByScore(df: DataFrame, groupCol: String,
                                  tokensCol: String, budget: Long,
                                  score: Column, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    Seq("_bf_score", "_bf_band", "_bf_cuts", "_bf_g", "_bf_minb").foreach(r =>
      require(!df.columns.contains(r),
        s"budgetFillByScore: input already has a column named $r (reserved)"))
    // band = number of cuts strictly below the score: monotone in score,
    // ties never straddle bands; null score (or null cuts) → band 0;
    // null GROUPS band like any other (the banding join is null-safe) —
    // shared losslessness core with the Prefix family
    val banded = Prefix.bandByScore(df, groupCol, score, buckets, "_bf_")
    // exclusive running token total at each band boundary, highest band
    // first — G×B rows, metadata-class; monotone because tokens are >= 0,
    // so the kept bands are a prefix and min() is the boundary
    val wBefore = Window.partitionBy(col(groupCol))
      .orderBy(col("_bf_band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keepBands = banded
      .groupBy(col(groupCol), col("_bf_band"))
      .agg(sum(col(tokensCol)).as("_bf_bt"))
      .withColumn("_bf_before",
        coalesce(sum(col("_bf_bt")).over(wBefore), lit(0L)))
      .filter(col("_bf_before") <= budget)
      .groupBy(col(groupCol)).agg(min(col("_bf_band")).as("_bf_minb"))
      .withColumnRenamed(groupCol, "_bf_g")
    banded.join(broadcast(keepBands), col(groupCol) <=> col("_bf_g"))
      .filter(col("_bf_band") >= col("_bf_minb"))
      .drop("_bf_band", "_bf_g", "_bf_minb")
  }
}
