package graft.operators

import graft.SparkSpec

class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  test("label centroids are elementwise means, exact on clean values") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)),
      (2, Seq(10.0f, -10.0f))
    ).toDF("label", "embedding")
    val got = VectorStats.labelCentroids(df, "label", "embedding")
      .orderBy("label", "dim")
      .as[(Int, Int, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1, 0, 2.0, 2L), (1, 1, 3.0, 2L),
      (2, 0, 10.0, 1L), (2, 1, -10.0, 1L)))
  }

  test("result is invariant to row order (decimal sum kills reduction order)") {
    val vecs = (0 until 64).map(i => (i % 3, Seq.tabulate(8)(j => (i * 0.37f + j * 1.13f))))
    val a = VectorStats.labelCentroids(vecs.toDF("label", "embedding"), "label", "embedding")
      .orderBy("label", "dim").as[(Int, Int, Double, Long)].collect().toSeq
    val b = VectorStats.labelCentroids(
        scala.util.Random.shuffle(vecs).toDF("label", "embedding")
          .repartition(7), "label", "embedding")
      .orderBy("label", "dim").as[(Int, Int, Double, Long)].collect().toSeq
    assert(a == b)
  }
}
