package graft.operators

import graft.SparkSpec

class VectorStatsSpec extends SparkSpec {

  test("standardize: per-dim mean ~0 / std ~1; constant dims map to 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Array(1.0f, 5.0f)), (2L, Array(3.0f, 5.0f)), (3L, Array(5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val z = VectorStats.standardize(df, "vec_id", "embedding")
      .as[(Long, Int, Double)].collect()
    val byDim = z.groupBy(_._2)
    // dim 0: values 1,3,5 → mean 3, population std sqrt(8/3)
    val d0 = byDim(0).sortBy(_._1).map(_._3)
    val std0 = math.sqrt(8.0 / 3.0)
    assert(math.abs(d0(0) - (-2.0 / std0)) < 1e-12)
    assert(math.abs(d0(1)) < 1e-12)
    assert(math.abs(d0(2) - 2.0 / std0) < 1e-12)
    // dim 1 constant → z = 0 everywhere, no NaN/divide-by-zero
    assert(byDim(1).forall(_._3 == 0.0))
    // standardized dims have mean ~0
    assert(math.abs(d0.sum) < 1e-12)
  }

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
