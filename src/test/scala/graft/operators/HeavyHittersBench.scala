package graft.operators

/** Eviction-regime micro-benchmark for the two SpaceSaving buffers
  * (SCALE.md "SpaceSaving stream-summary" section):
  *
  *   sbt "Test/runMain graft.operators.HHBench"
  *
  * 2M observations from a skewed 200k-item universe — far above any
  * capacity, so nearly every absent-item offer evicts: the regime where
  * the reference impl's O(m) min-scan dominates. Results are asserted
  * identical before timings are reported (best of 2 after warmup).
  */
object HHBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val universe = 200000
    val n = 2000000
    val stream = Array.fill(n)(
      "w" + math.min(rnd.nextInt(universe), rnd.nextInt(universe)))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (m <- Seq(256, 1024, 4096)) {
      val ref = new HeavyHitters.SpaceSavingAgg(m)
      val fast = new HeavyHitters.StreamSummaryAgg(m)
      def runRef() = { val (r, t) = time(stream.foldLeft(ref.zero)(ref.reduce)); (ref.finish(r), t) }
      def runFast() = { val (r, t) = time(stream.foldLeft(fast.zero)(fast.reduce)); (fast.finish(r), t) }
      runRef(); runFast() // warmup
      val (_, t1) = runRef(); val (r2, t2) = runRef()
      val (_, u1) = runFast(); val (f2, u2) = runFast()
      require(r2 == f2, s"m=$m: results differ between implementations")
      println(f"m=$m%5d  ref=${math.min(t1, t2)}%6.2fs  fast=${math.min(u1, u2)}%6.2fs  " +
        f"speedup=${math.min(t1, t2) / math.min(u1, u2)}%.1fx")
    }
  }
}
