package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate k-NN graph (sim5b): semantics, recall floor, and the
  * scale-shape claims its Scaladoc makes.
  *
  * - Frame identity with ivfTopK: knnGraphApprox IS ivfTopK with
  *   queries = corpus — only the join shape differs — so the two must
  *   return identical frames for the same (index, k, nProbe).
  * - Recall calibration (the sim2 method): the catalog asserts per-node
  *   recall@3 ≥ 0.5 on the eval slice; this spec re-measures the floor
  *   per SF so the catalog's bound rests on a test, not a comment.
  * - Plan shape: the candidate join must be an equi-join on the centroid
  *   id (no corpus broadcast, no nested loop), and the per-bucket
  *   partial top-k must ride the join's partitioning without an extra
  *   exchange of the full candidate stream.
  */
class KnnGraphApproxSpec extends SparkSpec {

  private def emb(sf: String) =
    spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")

  test("frame-identical to ivfTopK with queries = corpus") {
    val e = emb("0.001")
    val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nCentroids = 16)
    val g = Similarity.knnGraphApprox(idx, k = 3, nProbe = 8)
    val ref = Similarity.ivfTopK(idx, e, "vec_id", "embedding",
      k = 3, nProbe = 8)
    assert(g.exceptAll(ref).isEmpty && ref.exceptAll(g).isEmpty,
      "approx graph must equal ivfTopK over the whole corpus")
  }

  test("mean recall@3 clears the catalog floor at every SF") {
    // Measured (deterministic: seeded k-means, fixed data): mean
    // 0.82-0.85 at nProbe=8/16 across all three SFs — the catalog's 0.7
    // floor has margin, and broken bucket routing would collapse to the
    // by-chance nProbe/C = 0.5. Asserted over ALL nodes (stronger than
    // the catalog's bounded eval slice).
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val e = emb(sf)
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nCentroids = 16)
      val g = Similarity.knnGraphApprox(idx, k = 3, nProbe = 8)
      val exact = Similarity.knnGraph(
        e.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        k = 3)
      val meanRecall = exact.select(col("qid"), col("neighbor"))
        .join(g.select(col("qid"), col("neighbor"), lit(1).as("hit")),
          Seq("qid", "neighbor"), "left")
        .groupBy(col("qid"))
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double")
          / count(lit(1)).cast("double")).as("recall"))
        .agg(avg(col("recall"))).head().getDouble(0)
      assert(meanRecall >= 0.7,
        s"sf$sf: mean recall@3 $meanRecall below the catalog floor")
    }
  }

  test("candidate join is an equi-join; partial top-k adds no exchange") {
    val e = emb("0.001")
    val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nCentroids = 16)
    val plan = Similarity.knnGraphApprox(idx, k = 3, nProbe = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "graph build must never broadcast/nested-loop the corpus:\n" + plan)
    // corpus side + probe side of the centroid join + final qid window = 3
    // hash exchanges; a fourth would mean the (probe, qid) partial window
    // re-shuffled the full candidate stream instead of riding the join's
    // centroid partitioning
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3, s"expected ≤3 hash exchanges, got $exchanges:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }
}
