package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169):
  * score every document by how much more likely its tokens are under a
  * TARGET slice's unigram distribution than under the rest of the
  * corpus — `log w(d) = Σ_t m_t · ln(p_target(t) / p_raw(t))` with
  * add-one-smoothed distributions over the union vocabulary. Data
  * selection keeps the high-weight documents: "give me general-web text
  * that reads like my target domain" is exactly this number.
  *
  * Cross-engine determinism (the kl1 scheme at document grain): counts
  * are exact integers; each token-type log-ratio rounds to
  * DECIMAL(18,12) at the `ln` boundary, multiplies by its exact integer
  * in-doc multiplicity, and sums as DECIMAL — so the weight, and the
  * `keep` sign test made on the decimal BEFORE the double cast, are
  * engine-exact.
  *
  * Shape at scale: doc-local multiplicities ride the native
  * [[graft.functions.NgramCounts]] projection; one (token) vocabulary
  * aggregation with conditional sums, a 1-row totals broadcast, one
  * token-keyed equi-join back, one (doc) aggregation. Vocabulary-bounded
  * model state, nothing driver-side.
  */
object ImportanceWeights {

  /** Per-document log importance weight against `targetSource`:
    * (id, n_tokens BIGINT, log_weight DOUBLE, keep BOOLEAN) — `keep` is
    * the log_weight > 0 sign test, the simplest DSIR selection rule.
    */
  def logImportanceWeights(df: DataFrame, idCol: String, textCol: String,
                           sourceCol: String, targetSource: String)
      : DataFrame = {
    val toks = df
      .select(col(idCol), (col(sourceCol) === lit(targetSource)).as("_iw_t"),
        explode(graft.functions.NgramCounts.ngramCounts(col(textCol), 1))
          .as("_tc"))
      .select(col(idCol), col("_iw_t"), col("_tc.gram").as("token"),
        col("_tc.cnt").cast("long").as("m"))
    val vocab = toks.groupBy(col("token"))
      .agg(sum(when(col("_iw_t"), col("m")).otherwise(lit(0L))).as("ct"),
        sum(col("m")).as("call"))
    val totals = vocab.agg(sum(col("ct")).as("nt"),
      sum(col("call") - col("ct")).as("nr"), count(lit(1)).as("v"))
    val pT = (col("ct").cast("double") + lit(1.0)) /
      (col("nt").cast("double") + col("v").cast("double"))
    val pR = ((col("call") - col("ct")).cast("double") + lit(1.0)) /
      (col("nr").cast("double") + col("v").cast("double"))
    toks.join(vocab, "token").crossJoin(broadcast(totals))
      .select(col(idCol), col("m"),
        // m as DECIMAL(18,0): raw long×DECIMAL(18,12) would exceed
        // precision 38 and Spark's precision-loss rule silently drops the
        // scale to 11; (18,0)×(18,12) → (37,12) fits precision 38 and
        // stays exact — and unlike (9,0) cannot overflow-to-NULL for any
        // plausible per-doc multiplicity (the oracle uses DECIMAL(18,0))
        (col("m").cast("decimal(18,0)")
          * log(pT / pR).cast("decimal(18,12)")).as("_iw_s"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).cast("bigint").as("n_tokens"),
        sum(col("_iw_s")).as("_iw_sum"))
      .select(col(idCol), col("n_tokens"),
        col("_iw_sum").cast("double").as("log_weight"),
        (col("_iw_sum") > lit(0)).as("keep"))
  }
}
