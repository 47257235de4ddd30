package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA building blocks for embedding post-processing — the
  * "remove the dominant component" step (Arora et al.'s SIF / the
  * all-but-the-top embedding denoise recipe): common-direction energy in
  * learned embeddings encodes frequency, not content, and retrieval
  * improves when the top principal direction is projected out.
  *
  * Scale shape: the full covariance is ONE typed-[[Aggregator]] pass —
  * each task folds its vectors into a D + D(D+1)/2 double buffer
  * (D=64 → 2 KB + 17 KB), partials combine map-side, and ONE buffer per
  * partition shuffles regardless of N. The eigen-solve then runs on the
  * driver over the D×D matrix — O(D²) memory, INDEPENDENT of corpus
  * size, the same "tiny dense tail after a distributed reduction" shape
  * as a learned-regression closed form. The projection pass is ordinary
  * codegen'd column arithmetic over a broadcast literal vector.
  *
  * Power iteration: v ← Σv/‖Σv‖ from a deterministic start. Covariance
  * matrices are PSD so the iteration converges to the dominant
  * eigenvector whenever the start has a component along it; the all-ones
  * start is deterministic (no RNG — resume/replay-safe) and a zero
  * overlap with it is measure-zero for learned embeddings.
  */
object Pca {

  /** Accumulated second-moment state: count, per-dim sum, and the upper
    * triangle of the Gram matrix Σxxᵀ in row-major packed order.
    */
  final case class Moments(n: Long, s: Array[Double], g: Array[Double])

  /** One-pass moments aggregator over float vectors of fixed `dim`. */
  final class MomentsAgg(dim: Int)
      extends Aggregator[Seq[Float], Moments, Moments] {
    require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
    private val tri = dim * (dim + 1) / 2

    override def zero: Moments =
      Moments(0L, new Array[Double](dim), new Array[Double](tri))

    override def reduce(b: Moments, x: Seq[Float]): Moments = {
      require(x.length == dim, s"vector length ${x.length} != dim $dim")
      val xa = new Array[Double](dim)
      var i = 0
      while (i < dim) { xa(i) = x(i).toDouble; i += 1 }
      i = 0
      var t = 0
      while (i < dim) {
        b.s(i) += xa(i)
        var j = i
        while (j < dim) { b.g(t) += xa(i) * xa(j); t += 1; j += 1 }
        i += 1
      }
      Moments(b.n + 1, b.s, b.g)
    }

    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < tri) { a.g(i) += b.g(i); i += 1 }
      Moments(a.n + b.n, a.s, a.g)
    }

    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Dense symmetric D×D covariance from packed moments:
    * Σ = G/n − μμᵀ (population covariance).
    */
  def covariance(m: Moments, dim: Int): Array[Array[Double]] = {
    require(m.n > 0, "covariance needs at least one vector")
    val mu = m.s.map(_ / m.n)
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = m.g(t) / m.n - mu(i) * mu(j)
        c(i)(j) = v
        c(j)(i) = v
        t += 1
        j += 1
      }
      i += 1
    }
    c
  }

  /** Dominant eigenpair of a symmetric PSD matrix by power iteration from
    * the deterministic normalized all-ones start. Returns (λ₁, v).
    */
  def topEigenpair(cov: Array[Array[Double]], maxIters: Int = 1000,
                   tol: Double = 1e-14): (Double, Array[Double]) = {
    val d = cov.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIters && delta > tol) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        val row = cov(i)
        var j = 0
        while (j < d) { acc += row(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "zero covariance matrix — no dominant direction")
      val vn = w.map(_ / norm)
      // fix sign for determinism (eigenvectors are sign-ambiguous):
      // first nonzero component positive
      val sign = vn.find(math.abs(_) > 1e-12).map(x => math.signum(x)).getOrElse(1.0)
      val vs = vn.map(_ * sign)
      delta = vs.zip(v).map { case (a, b) => math.abs(a - b) }.max
      v = vs
      iter += 1
    }
    // Rayleigh quotient at the converged vector — more accurate than the
    // in-loop ‖Σv‖ estimate (exact when v IS the eigenvector)
    lambda = {
      var acc = 0.0
      var i = 0
      while (i < d) {
        var rv = 0.0
        var j = 0
        while (j < d) { rv += cov(i)(j) * v(j); j += 1 }
        acc += v(i) * rv
        i += 1
      }
      acc
    }
    (lambda, v)
  }

  /** Driver-side eigen summary of one moments pass: dominant eigenvalue,
    * covariance trace (total variance), the largest diagonal entry (best
    * single coordinate axis — λ₁ must dominate it), and the corpus size.
    */
  final case class EigenSummary(lambda: Double, trace: Double,
                                maxDiag: Double, n: Long)

  /** Full pipeline over a vector column: compute moments (one distributed
    * pass), solve the top eigenpair on the driver, and return a frame of
    * per-vector energies — total centered energy ‖x−μ‖² and the part
    * along the dominant direction ((x−μ)·v)² — whose difference is the
    * residual energy after removing the top component. All three are
    * plain codegen'd arithmetic over broadcast literal arrays.
    */
  def topComponentEnergies(df: DataFrame, idCol: String, vecCol: String,
                           dim: Int): (DataFrame, EigenSummary) = {
    val sp = df.sparkSession
    import sp.implicits._
    val agg = new MomentsAgg(dim)
    val m = df.select(col(vecCol)).as[Seq[Float]]
      .select(agg.toColumn).head()
    val cov = covariance(m, dim)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val maxDiag = (0 until dim).map(i => cov(i)(i)).max
    val (lambda, v) = topEigenpair(cov)
    val mu = m.s.map(_ / m.n)
    val muCol = array(mu.map(lit).toIndexedSeq: _*)
    val vCol = array(v.map(lit).toIndexedSeq: _*)
    // centered = x − μ; proj = centered·v; total = centered·centered
    val centered = zip_with(col(vecCol).cast("array<double>"), muCol,
      (x, mC) => x - mC)
    val out = df.select(col(idCol), centered.as("c"))
      .select(col(idCol),
        aggregate(zip_with(col("c"), vCol, (c, vc) => c * vc),
          lit(0.0), (acc, x) => acc + x).as("proj"),
        aggregate(col("c"), lit(0.0), (acc, x) => acc + x * x).as("total"))
      .select(col(idCol), col("total"),
        (col("proj") * col("proj")).as("along_top"))
    (out, EigenSummary(lambda, trace, maxDiag, m.n))
  }
}
