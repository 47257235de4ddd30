package graft.queries

import graft.SparkSpec

/** [[ScalingSpec]]'s assertion re-run at the 10×-bigger step sf0.1 → sf1
  * (the locally generated tier — `graft.TestDataGen`; see SCALE_SF1.md).
  * The tier is gitignored but BUILD-GATED ([[graft.Sf1Tier]], round 12):
  * a fresh-clone `sbt test` generates it once per machine (deterministic,
  * ~175 MB, ~1-2 min) and then runs this spec for real — the 10× regime
  * is no longer opt-in. Only the SPARK_GRAFT_SKIP_SF1=1 escape hatch
  * cancels (loudly), for machines where the one-time cost is
  * unacceptable.
  *
  * Bounds are re-calibrated for this tier's growth: documents/orders/
  * events grow a full 10× (linear ≈ 10× timed growth once overhead stops
  * diluting — fz1 measures 9.9×; quadratic ≈ 50-100×), embeddings grow
  * 4× (linear ≈ 4×, quadratic ≈ 16×). So: 20× document-grain, 8×
  * embedding-grain — each ~2× above measured-linear, well under its
  * quadratic signature.
  */
class ScalingSpecSf1 extends SparkSpec {

  private val sf1 = graft.Sf1Tier.dir

  private val risky = Seq(
    "dc2_incremental_clusters" -> 20.0, // measured 1.0×
    "il1_incremental_lsh" -> 20.0, // measured 2.0×
    // r11 measured 9.9× with the 8-char block key; r12's pair-volume
    // audit exposed that as quadratic-with-small-constant (17·n pairs at
    // sf1) and moved the key to the 14-char corruption-invariant prefix
    // (0.87·n) — see FuzzyBlockingBudgetSpec, which now owns the real
    // cost model; this wall-clock bound stays as the coarse backstop
    "fz1_fuzzy_match" -> 20.0,
    "up2_upsert_partitioned" -> 20.0, // measured 1.9×
    "th1_theta_overlap" -> 20.0, // measured 1.7× (in-plan aggregate)
    "semd2_incremental_semantic" -> 8.0, // measured 1.2×
    "d5b_banded_near_dup" -> 8.0, // measured 1.3×
    "sim5b_knn_graph_approx" -> 8.0, // measured 1.4×
    // d5's sign-LSH crowds buckets on clustered vectors — measured 5.9×
    // (n^1.3, documented in its scaladoc). The 12× bound is NOT linear
    // headroom; it distinguishes that contract from a regression to the
    // ~16× quadratic signature.
    "d5_cosine_near_dup" -> 12.0,
    // r12 combination-banded scale twin: measured 2.0× wall-clock and
    // 1.03→1.11 candidate volume at this step (LshBucketBudgetSpec owns
    // the volume bound; this is the coarse wall-clock backstop)
    "d3b_simhash_wide" -> 20.0)

  test("risky families stay inside their bounds at the sf1 tier") {
    assume(graft.Sf1Tier.available(spark),
      "sf1 tier generation skipped via SPARK_GRAFT_SKIP_SF1=1")
    // best-of-3, as in ScalingSpec: the sf1 reps are longer and so more
    // exposed to one slow rep on a loaded host
    val rows = ScalingAudit.sweep(spark, risky.map(_._1),
      "/root/testdata/sf0.1", sf1, reps = 3)
    val bounds = risky.toMap
    val bad = rows.filter(m => m.suspect(bounds(m.name)))
    assert(bad.isEmpty, "suspected superlinear paths at sf1:\n" + bad.map(m =>
      f"  ${m.name}: ${m.lo}%.3f s -> ${m.hi}%.3f s (${m.ratio}%.1fx, " +
        f"bound ${bounds(m.name)}%.0fx)").mkString("\n"))
  }

  /** semd1-the-query keeps nClusters=16 for cross-SF oracle determinism,
    * which is quadratic-in-cluster by construction (6.7× at this tier's
    * 4× embeddings step — SCALE_SF1.md). The PRODUCTION contract is the
    * auto-sized form (C ≈ √n via `ivfSizing`): per-cluster pair volume
    * (n/C)²·C and assignment n·C·dim both land at n^1.5, whose signature
    * at a 4× step is 8×; a regression to fixed-C quadratic reads ~16×.
    * Measured 2.3× (best-of-3, r12). This pins the claim the semd1
    * scaladoc makes in prose.
    */
  test("auto-sized semanticDupPairs holds the n^1.5 contract at the sf1 step") {
    assume(graft.Sf1Tier.available(spark),
      "sf1 tier generation skipped via SPARK_GRAFT_SKIP_SF1=1")
    def best(dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.SemanticDedup.semanticDupPairs(
          spark.read.parquet(s"$dir/embeddings.parquet"),
          "vec_id", "embedding",
          nClusters = 0, threshold = 0.9, assignProbes = 2)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      Seq.fill(3)(once()).min
    }
    val lo = best("/root/testdata/sf0.1")
    val hi = best(sf1)
    val ratio = hi / lo
    assert(ratio <= 8.0,
      f"auto-sized semantic dedup grew $ratio%.1fx at a 4x embeddings " +
        f"step ($lo%.3f s -> $hi%.3f s) — past the n^1.5 signature (8x), " +
        "approaching fixed-C quadratic (~16x)")
  }
}
