package graft.queries

import graft.SparkSpec

/** [[ScalingSpec]]'s assertion re-run at the 10×-bigger step sf0.1 → sf1
  * (the locally generated tier — `graft.TestDataGen`; see SCALE_SF1.md).
  * The tier is gitignored and regenerated on demand, so this spec CANCELS
  * (not fails) when it is absent — CI without the tier is unaffected, and
  * a developer who generated it gets the bound checked in the regime the
  * scaling claims reason about.
  *
  * Bounds are re-calibrated for this tier's growth: documents/orders/
  * events grow a full 10× (linear ≈ 10× timed growth once overhead stops
  * diluting — fz1 measures 9.9×; quadratic ≈ 50-100×), embeddings grow
  * 4× (linear ≈ 4×, quadratic ≈ 16×). So: 20× document-grain, 8×
  * embedding-grain — each ~2× above measured-linear, well under its
  * quadratic signature.
  */
class ScalingSpecSf1 extends SparkSpec {

  private val sf1 = "local-data/sf1"

  private val risky = Seq(
    "dc2_incremental_clusters" -> 20.0, // measured 1.0×
    "il1_incremental_lsh" -> 20.0, // measured 2.0×
    "fz1_fuzzy_match" -> 20.0, // measured 9.9× — linear-with-corpus
    "up2_upsert_partitioned" -> 20.0, // measured 1.9×
    "th1_theta_overlap" -> 20.0, // measured 1.7× (in-plan aggregate)
    "semd2_incremental_semantic" -> 8.0, // measured 1.2×
    "d5b_banded_near_dup" -> 8.0, // measured 1.3×
    "sim5b_knn_graph_approx" -> 8.0, // measured 1.4×
    // d5's sign-LSH crowds buckets on clustered vectors — measured 5.9×
    // (n^1.3, documented in its scaladoc). The 12× bound is NOT linear
    // headroom; it distinguishes that contract from a regression to the
    // ~16× quadratic signature.
    "d5_cosine_near_dup" -> 12.0)

  test("risky families stay inside their bounds at the sf1 tier") {
    assume(new java.io.File(sf1).isDirectory,
      s"sf1 tier not generated (sbt 'Test/runMain graft.TestDataGen $sf1 10')")
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
}
