package graft.queries

import graft.SparkSpec

/** Catalog-wide scan-pruning invariant — the third sweep-style check after
  * [[JoinShapeSpec]] (join shapes) and [[ScalingSpec]] (growth): no query
  * may read a HEAVY column (`documents.text`, `embeddings.embedding`,
  * `events.props` — the columns that ARE the data at 100 TB) unless it is
  * on the audited consumer list. Column pruning is what makes a
  * metadata-grain query (counts, keys, joins on ids) cost metadata-grain
  * IO on a 100 TB corpus; a regression that drags `text` into a scan that
  * only needs `doc_id` multiplies that query's IO by the corpus payload
  * ratio and is invisible to correctness tests — the result is identical,
  * only the read volume explodes.
  *
  * The allowlist below is the audited population (77 of 175
  * entries; see `ScanPruningAudit` for the generator): every entry either
  * computes ON the heavy column (hashing, shingling, scoring, tokenizing,
  * vector math, JSON extraction) or intentionally emits it (exports,
  * ad-hoc display, curation outputs). A NEW query reading a heavy column
  * fails here until it is reviewed and added deliberately; an EXISTING
  * query newly reading one is a pruning regression.
  */
class ScanPruningSpec extends SparkSpec {

  /** query -> heavy columns its scans may read (audited consumers). */
  private val allowed: Map[String, Set[String]] = {
    val text = Set("text"); val emb = Set("embedding"); val props = Set("props")
    Map(
      // text consumers: dedup/fingerprint hashing, chunking, tokenizing,
      // quality/language scoring, retrieval, LM, curation, export, display
      "bm25_1_retrieval" -> text, "bp1_boilerplate" -> text,
      "bpe1_subword_stats" -> text, "cd1_chunk_dedup" -> text,
      "cd2_line_dedup" -> text, "ch1_doc_chunking" -> text,
      "cr1_corpus_report" -> text, "ct1_contamination" -> text,
      "ct2_ngram_decontamination" -> text, "cur1_curation" -> text,
      "cur2_curation_v2" -> text, "cur3_bpe_curation" -> text,
      "d1_exact_dedup" -> text, "d2_minhash_lsh" -> text,
      "d3_simhash" -> text, "d3b_simhash_wide" -> text,
      "d4_ngram_jaccard" -> text,
      "dsir1_importance_weights" -> text, "ex2_jsonl_export" -> text,
      "f4_null_guard" -> text, "ff1_filter_funnel" -> text,
      "fq1_mean_token_freq" -> text, "fr1_token_frequency" -> text,
      "fz1_fuzzy_match" -> text, "g1_explode_tokens" -> text,
      "gf1_gopher_funnel" -> text, "gq1_gopher_repetition" -> text,
      "hh1_heavy_hitters" -> text, "il1_incremental_lsh" -> text,
      "il2_bloom_prefilter" -> text, "kl1_source_divergence" -> text,
      "mh1_signature_reuse" -> text, "ml1_mixed_language" -> text,
      "mm1_media_meta" -> text, "mm2_media_features" -> text,
      "mm3_frame_sample" -> text, "mrr1_retrieval_eval" -> text,
      "pii1_redaction" -> text, "pk1_sequence_packing" -> text,
      "pk1b_packing_prefix" -> text,
      "pk2_bpe_packing" -> text, "pmi1_collocations" -> text,
      "ppl1_lm_perplexity" -> text, "pr1_profile" -> text,
      "qb1_quality_quartile" -> text, "qb1b_quartile_prefix" -> text,
      "qk1_top_quality_docs" -> text,
      "s4_orc_roundtrip" -> text, "t1_token_stats" -> text,
      "t2_quality_score" -> text, "t3_langid" -> text,
      "t4_fingerprint" -> text, "t6_normalize" -> text,
      "tb1_token_budget" -> text, "tb1b_token_budget_pruned" -> text,
      "tb2_bpe_token_budget" -> text,
      "tf1_tfidf_topterms" -> text, "u1_sentiment_udf" -> text,
      "x1_adhoc_sample" -> text,
      // embedding consumers: vector math end-to-end
      "cen1_label_centroids" -> emb, "ctr1_contrastive_pairs" -> emb,
      "ctr2_contrastive_ivf" -> emb, "d5_cosine_near_dup" -> emb,
      "d5b_banded_near_dup" -> emb, "semd1_semantic_dedup" -> emb,
      "semd2_incremental_semantic" -> emb, "sim1_ann_topk" -> emb,
      "sim2_ivf_topk" -> emb, "sim3_quantized_topk" -> emb,
      "sim4_ivf_persisted" -> emb, "sim5_knn_graph" -> emb,
      "sim5b_knn_graph_approx" -> emb, "std1_standardize" -> emb,
      // props consumers: JSON payload extraction / regex over the payload
      "f5_notnull_filter" -> props, "js1_json_extract" -> props,
      "js2_from_json" -> props, "t5_regex_tokens" -> props,
    )
  }

  test("catalog-wide: heavy columns read only by audited consumers") {
    val offenders = CatalogPlans.executedPlans
      .flatMap { case (name, plan) =>
        val reads = ScanPruning.heavyReads(plan)
          .map(_.takeWhile(_ != '@')).toSet
        val extra = reads -- allowed.getOrElse(name, Set.empty)
        if (extra.nonEmpty)
          Some(s"$name reads ${extra.mkString(", ")} (unaudited)")
        else None
      }
    assert(offenders.isEmpty,
      "heavy-column pruning violations (audit the read before " +
        "allowlisting):\n  " + offenders.mkString("\n  "))
  }

  test("allowlist carries no dead entries (every name is a catalog query)") {
    val dead = allowed.keySet -- graft.SparkEntry.queries.keySet
    assert(dead.isEmpty, s"stale allowlist entries: ${dead.mkString(", ")}")
  }
}
