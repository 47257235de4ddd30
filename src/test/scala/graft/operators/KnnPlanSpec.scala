package graft.operators

import graft.SparkSpec

/** Plan shape of the exact k-NN graph: the partial top-k window rides the
  * block join's existing pk partitioning (no exchange of the n² scored
  * pairs), so the only exchanges are the block join's own two shuffles
  * plus the final per-node window over the ≤ B·k survivors.
  */
class KnnPlanSpec extends SparkSpec {

  test("partial top-k adds no exchange over the n² pair stream") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // join left side + join right side + final src window = 3; a fourth
    // would mean the (pk, src) window re-shuffled the full pair stream
    assert(exchanges <= 3, s"expected ≤3 hash exchanges, got $exchanges:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "block-pair join must stay an equi-join")
  }
}
