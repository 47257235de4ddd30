package graft.queries

import graft.SparkSpec

/** Physical-plan assertions for the scale-critical properties (SURVEY.md §4):
  * filters reach the parquet scan, projections prune the read schema, small
  * dims broadcast, aggregates run partial+final. These are the properties
  * that decide 100TB behavior; asserting them keeps regressions out.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("F1 filter is pushed down to the parquet scan") {
    val p = plan("f1_conj_filter")
    // (the plan string truncates the filter list; the prefix is stable)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p)
    assert(p.contains("GreaterThanOrEqual(l_quanti"), p)
  }

  test("P1 projection prunes the scan to the 3 selected columns") {
    val p = plan("p1_project_rename")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey")
      && readSchema.contains("l_linenumber")
      && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("J1/J3 dim joins broadcast the small side") {
    assert(plan("j1_left_join").contains("BroadcastHashJoin"))
    assert(plan("j3_inner_join_orderby").contains("BroadcastHashJoin"))
  }

  test("J2 anti-join plans as a real anti join (no driver-side diff)") {
    assert(plan("j2_anti_join").contains("LeftAnti"))
  }

  test("A1 grouped aggregate runs partial+final hash aggregation") {
    val p = plan("a1_group_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("core agg pipeline stays inside whole-stage codegen") {
    // codegen'd spans print as "*(n)" prefixes — only visible in the final
    // AQE plan, so execute first
    val df = graft.SparkEntry.queries("a1_group_agg")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p)
  }

  test("metric-view star joins broadcast and prune to requested joins") {
    Seq("lineitem", "orders", "part", "supplier").foreach(n =>
      spark.read.parquet(s"$sf/$n.parquet").createOrReplaceTempView(n))
    val one = SemanticQueries.lineitemView
      .query(spark, Seq("line_count"), Seq("brand"))
      .queryExecution.executedPlan.toString
    assert(one.contains("BroadcastHashJoin"))
    assert("Scan parquet".r.findAllIn(one).size == 2, "only fact + part scans")
  }

  test("topk lowers to TakeOrderedAndProject (no global sort)") {
    assert(plan("s1_topk").contains("TakeOrderedAndProject"))
  }

  test("interval joins are equi-joins: no nested loop, no cartesian") {
    Seq("rj1_range_join", "st4_interval_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("split and mix are scan-pipelined: no exchange in the plan") {
    Seq("sp1_dataset_split", "mix1_corpus_mix").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q: $p")
    }
  }

  test("round-3 ops: redaction/packing pipeline into the scan shape") {
    // pii1 is a pure projection: no exchange at all
    assert(!plan("pii1_redaction").contains("Exchange"),
      plan("pii1_redaction"))
    // zo1's unrolled bit-interleave stays a projection + top-k
    val zo = plan("zo1_zorder_key")
    assert(zo.contains("TakeOrderedAndProject"), zo)
    assert(!zo.contains("Exchange"), zo)
  }

  test("url1 blocklist filter is a broadcast anti-join") {
    val p = plan("url1_url_filter")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("stratified sample and first-event push the rank limit into the sort") {
    Seq("ss1_stratified_sample", "sd1_first_event").foreach { q =>
      val p = plan(q)
      // Spark's WindowGroupLimit keeps only n winners per key before the
      // full window sort — the property that makes rank<=n scale on skew
      assert(p.contains("WindowGroupLimit"), s"$q: $p")
    }
  }

  test("h4 big-orders: partial+final agg, top-k lowering, no cartesian") {
    val p = plan("h4_big_orders")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("centroid aggregation runs partial+final (map-side combine)") {
    val p = plan("cen1_label_centroids")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("funnel and profiler are single-pass: one aggregate, no joins") {
    Seq("ff1_filter_funnel", "pr1_profile").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      // partial+final of ONE aggregation — no per-rule/per-column scans
      assert(p.linesIterator.count(_.contains("Scan ")) == 1,
        s"$q scans more than once:\n$p")
    }
  }

  test("banded near-dup (d5b) is equi-joins only: no cartesian, no BNLJ") {
    val p = plan("d5b_banded_near_dup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("histogram bounds broadcast into the binning pass (no cartesian)") {
    val p = plan("hist1_price_histogram")
    // the single-row (min, max) side arrives via a broadcast exchange and
    // the binned aggregation itself runs partial+final
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("event-sequence assembly pays exactly one shuffle") {
    val p = plan("seq1_user_event_sequence")
    assert("ShuffleExchange|Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected a single hash exchange:\n$p")
  }

  test("snapshot diff and apply-delta are equi-joins only") {
    Seq("diff1_snapshot_diff", "diff2_apply_delta").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("collocation unigram/bigram joins are hash joins, totals broadcast") {
    val p = plan("pmi1_collocations")
    assert(!p.contains("CartesianProduct"), p)
    // the single-row totals frame may ride a broadcast nested loop — that
    // is the intended 1-row cross join — but the token-keyed joins must
    // be hash equi-joins
    assert(p.contains("HashJoin"), p)
  }

  test("bounded sequence and EWMA reuse one key partitioning (single exchange)") {
    // window(user_id) → filter → groupBy(user_id): the groupBy reuses the
    // window's hash partitioning, so the whole tail+fold costs ONE shuffle
    Seq("seq2_bounded_sequence", "ew1_ewma_clicks").foreach { q =>
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q expected a single hash exchange:\n$p")
    }
  }

  test("chunk-grain dedup joins by digest: hash joins, no cartesian") {
    val p = plan("cd1_chunk_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("m8 verbatim-document view prunes to the requested joins only") {
    val p = plan("m8_review_metrics_yaml")
    // the document declares 5 joins; the 3 requested dims touch 2 — the
    // plan must scan fact + games + genres and nothing else
    assert("Scan parquet".r.findAllIn(p).size == 3, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ctr2 IVF negative mining stays cartesian-free") {
    // (the in-plan brute-force comparison side keeps the documented sim1
    // broadcast-NLJ posture, so only cartesians are asserted away)
    assert(!plan("ctr2_contrastive_ivf").contains("CartesianProduct"))
  }

  test("BM25 is an inverted-index equi-join: hash joins, no cartesian") {
    val p = plan("bm25_1_retrieval")
    assert(!p.contains("CartesianProduct"), p)
    // the 1-row (n_docs, sum_dl) totals may ride a broadcast nested loop
    // (the pmi1 posture); the term/doc-keyed joins must be hash joins
    assert(p.contains("HashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("semantic dedup self-joins on the cluster key: no cartesian") {
    val p = plan("semd1_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("bigram-LM scoring joins model tables by key: no cartesian") {
    val p = plan("ppl1_lm_perplexity")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("host cap: rank limit pushes to a pre-shuffle group limit") {
    // the old one-exchange form computed host_total as a count-over-
    // partition in the window, which blocked InferWindowGroupLimit and
    // buffered WHOLE hosts in single tasks; the cap must now plan as a
    // partial+final WindowGroupLimit (each map task forwards ≤ k rows
    // per host) with the pre-cap total joined from a partial-aggregated
    // groupBy instead
    val p = plan("hc1_host_cap")
    assert(p.contains("WindowGroupLimit"),
      s"rank limit not pushed down:\n$p")
    assert(!p.contains("unboundedfollowing"),
      s"whole-partition window frame crept back in:\n$p")
  }

  test("retrieval eval and divergence stay cartesian-free equi-joins") {
    Seq("mrr1_retrieval_eval", "kl1_source_divergence").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      // kl1's full-outer vocabulary join correctly plans as a sort-merge
      // equi-join (full outers can't broadcast); everything else hashes
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$q: $p")
    }
  }

  test("13-gram decontamination broadcasts the benchmark hash set") {
    val p = plan("ct2_ngram_decontamination")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("gopher funnel is a single aggregation pass: no joins") {
    val p = plan("gf1_gopher_funnel")
    assert(!"Join".r.findAllIn(p).hasNext, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("importance weighting joins the vocabulary by token: no cartesian") {
    val p = plan("dsir1_importance_weights")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("from-index LSH keeps the banded equi-join posture: no cartesian") {
    val p = plan("mh1_signature_reuse")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incremental semantic dedup joins on the cell key: no cartesian") {
    // (the in-plan exact-verify companion keeps the documented sim1
    // broadcast-NLJ posture; cartesians are asserted away)
    assert(!plan("semd2_incremental_semantic").contains("CartesianProduct"))
  }

  test("temperature mix is a broadcast threshold join + scan filter") {
    val p = plan("mix2_temperature_mix")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("leakage-safe split is one left equi-join over the canonical map") {
    val p = plan("sp2_leakage_safe_split")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH verify joins hashed shingle sets, not strings") {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val df = graft.SparkEntry.queries("d2_minhash_lsh")(spark, sf)
    // inspect attribute TYPES on the resolved plan (plan toString does not
    // print them, so a string regex would be vacuous): every sh_set/sa/sb
    // attribute in the verify stage must be array<bigint>, i.e. hashed
    val setAttrs = df.queryExecution.analyzed.collect { case node =>
      node.output.filter(a => Set("sh_set", "sa", "sb").contains(a.name))
    }.flatten
    assert(setAttrs.nonEmpty, "expected shingle-set attributes in the plan")
    setAttrs.foreach { a =>
      a.dataType match {
        case ArrayType(LongType, _) => ()
        case other => fail(s"${a.name} carries $other — raw shingle strings?")
      }
    }
  }
}
