package graft.operators

/** One-off audit: measure the driver-local k-means trainer at LARGE C —
  * the round-15 verdict's open question. The 4·C sample floor made the
  * C ≈ √n auto-size TRAINABLE at any corpus, and the scaladoc argues
  * from flop math (iters·|sample|·C·dim) that assignment parallelism
  * across driver cores keeps the build "minutes, not hours" at
  * C = √(1e9) ≈ 3.2·10^4 — reasoned, never measured. This probe
  * measures it, so `ivfSizing`'s practical ceiling is a number, not an
  * estimate.
  *
  * Pure driver-side: no SparkSession, no I/O — the trainer is a local
  * loop over an in-memory sample by design ([[Similarity.trainKMeans]]),
  * so its cost is exactly what this times. Points are seeded uniform
  * doubles; k-means assignment cost is data-independent (every point
  * scans every centroid every iteration), so synthetic vs real vectors
  * time identically.
  *
  * Shapes, chosen against the scaladoc's own claims (dim 64, 10 iters —
  * the trainer's fixed iteration count):
  *  - C = 10^3, floor sample 4·C — sub-second sanity anchor
  *  - C = 10^4, floor sample 4·C (flops 2.6e11)
  *  - C = 3.2·10^4, floor sample 4·C (flops 2.6e12 — the C ≈ √n sizing
  *    at n = 10^9, the claim's exact shape)
  *  - C = 10^4, QUALITY sample 32·C (flops 2.0e12 — what a caller
  *    passing the recommended 30-40·C pays at the same C)
  *
  * Run: `sbt "Test/runMain graft.operators.TrainerScaleProbe"` in a
  * quiet window (the assignment step spreads across every core, so
  * concurrent load directly inflates the number).
  */
object TrainerScaleProbe {
  def main(args: Array[String]): Unit = {
    val dim = 64
    val iters = 10
    println(s"cores: ${Runtime.getRuntime.availableProcessors()}")
    def run(c: Int, sampleMult: Int): Unit = {
      val n = sampleMult * c
      val rnd = new scala.util.Random(7)
      val points = Array.fill(n)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      val t0 = System.nanoTime()
      val cents = Similarity.trainKMeans(points, c, iters, seed = 42L)
      val sec = (System.nanoTime() - t0) / 1e9
      val flops = 4.0 * iters * n * c * dim // ~4 flops per dim per pair
      println(f"C=$c%6d sample=${sampleMult}·C ($n%7d pts)  " +
        f"train $sec%8.1f s  (${flops / sec / 1e9}%6.1f GFLOP/s, " +
        f"centroids ${cents.length})")
    }
    run(1000, 4) // JIT warm + sanity anchor
    run(10000, 4)
    run(32000, 4)
    run(10000, 32)
  }
}
