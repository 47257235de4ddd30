package graft.queries

import graft.SparkSpec

/** Catalog-wide join-shape invariant — the 100 TB kill-switch check done
  * once for EVERY entry instead of per-query asserts scattered through
  * PlanSpec: no CartesianProduct anywhere, ever; BroadcastNestedLoopJoin
  * only where the build side is bounded BY CONTRACT (a BNLJ against a
  * broadcast of ≤ a few rows is the right plan — a scalar statistic or a
  * bounded query slice meeting every corpus row — while an unlisted BNLJ
  * means a join degenerated and would stream the corpus per partition of
  * the other side at scale).
  *
  * The allowlist is the audited r10 population; a NEW entry appearing
  * with a BNLJ fails here until its bound is reviewed and it is added
  * deliberately.
  */
class JoinShapeSpec extends SparkSpec {

  /** Entries whose BNLJ side is bounded by construction: single-row or
    * few-row scalar statistics broadcast to every row (corpus totals,
    * divergence denominators, histogram bounds), or ≤ tens-of-rows query
    * slices meeting the corpus (the sim1 brute-force posture and its
    * recall-eval descendants). sim5b is here for its bounded EVAL slice
    * only — its graph BUILD is asserted BNLJ-free in KnnGraphApproxSpec.
    */
  private val boundedBnlj = Set(
    "bm25_1_retrieval", "ctr1_contrastive_pairs", "ctr2_contrastive_ivf",
    "dsir1_importance_weights", "ex2_jsonl_export", "hh1_heavy_hitters",
    "hist1_price_histogram", "hll1_sketch_reuse", "kl1_source_divergence",
    "mix2_temperature_mix", "mrr1_retrieval_eval", "pmi1_collocations",
    "ppl1_lm_perplexity", "s4_orc_roundtrip", "semd2_incremental_semantic",
    "sim1_ann_topk", "sim2_ivf_topk", "sim3_quantized_topk",
    "sim4_ivf_persisted", "sim5b_knn_graph_approx", "tf1_tfidf_topterms")

  test("catalog-wide: no cartesian; BNLJ only where broadcast-bounded") {
    val offenders = CatalogPlans.executedPlans
      .flatMap { case (name, plan) =>
        val p = plan.toString
        val cart = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin") &&
          !boundedBnlj(name)
        if (cart) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unreviewed BroadcastNestedLoopJoin")
        else None
      }
    assert(offenders.isEmpty,
      "join-shape violations (review the bound before allowlisting):\n  " +
        offenders.mkString("\n  "))
  }
}
