package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA building blocks: the one-pass moments aggregator matches a naive
  * driver-side computation; power iteration recovers a planted dominant
  * direction; the distributed energy decomposition satisfies its
  * mathematical identities.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def naiveCov(vs: Seq[Array[Double]]): Array[Array[Double]] = {
    val n = vs.length
    val d = vs.head.length
    val mu = Array.tabulate(d)(i => vs.map(_(i)).sum / n)
    Array.tabulate(d, d) { (i, j) =>
      vs.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n
    }
  }

  test("moments aggregator == naive covariance, any partitioning") {
    val rng = new scala.util.Random(7)
    val vs = Seq.fill(97)(Array.fill(5)(rng.nextFloat()))
    val expected = naiveCov(vs.map(_.map(_.toDouble)))
    for (parts <- Seq(1, 3, 16)) {
      val ds = spark.createDataset(vs.map(_.toSeq))(
        implicitly[org.apache.spark.sql.Encoder[Seq[Float]]])
        .repartition(parts)
      val m = ds.select(new Pca.MomentsAgg(5).toColumn).head()
      assert(m.n == 97)
      val cov = Pca.covariance(m, 5)
      for (i <- 0 until 5; j <- 0 until 5)
        assert(math.abs(cov(i)(j) - expected(i)(j)) < 1e-9,
          s"cov($i)($j) parts=$parts")
    }
  }

  test("power iteration recovers a planted dominant direction") {
    // rank-1 spike λ·uuᵀ plus small isotropic noise on the diagonal
    val d = 8
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val norm = math.sqrt(u.map(x => x * x).sum)
    val un = u.map(_ / norm)
    val cov = Array.tabulate(d, d) { (i, j) =>
      10.0 * un(i) * un(j) + (if (i == j) 0.1 else 0.0)
    }
    val (lambda, v) = Pca.topEigenpair(cov)
    assert(math.abs(lambda - 10.1) < 1e-9)
    val dot = math.abs(v.zip(un).map { case (a, b) => a * b }.sum)
    assert(dot > 1.0 - 1e-9, s"|v·u| = $dot")
  }

  test("energy decomposition identities on the harness embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (en, sum) = Pca.topComponentEnergies(emb, "vec_id", "embedding", 64)
    val a = en.agg(avg($"total").as("mt"), avg($"along_top").as("mtop"),
      max($"along_top" - $"total").as("excess")).head()
    // mean ‖x−μ‖² = trace(Σ); mean ((x−μ)·v)² = vᵀΣv = λ̂
    assert(math.abs(a.getDouble(0) - sum.trace) < 1e-9 * sum.trace)
    assert(math.abs(a.getDouble(1) - sum.lambda) < 1e-9 * sum.lambda)
    // per-vector: energy along one direction never exceeds total energy
    assert(a.getDouble(2) <= 1e-12)
    // the dominant direction beats every coordinate axis, and is a
    // strict minority of total variance (embeddings are not rank-1)
    assert(sum.lambda >= sum.maxDiag * (1.0 - 1e-9))
    assert(sum.lambda < sum.trace)
  }
}
