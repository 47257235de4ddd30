package graft.operators

/** Per-task bounded top-k combiner for the exact k-NN graph's partial
  * phase (see [[Similarity.knnGraph]]): streams the block-pair join's
  * un-exploded pairs, feeds each pair to BOTH endpoints' bounded lists,
  * and emits ≤ k candidate edges per (task, node) — replacing a sort of
  * every directed candidate row with O(1)-amortized comparisons per
  * pair.
  *
  * Ordering contract (must match the row_number window it replaced,
  * because the final per-node window ranks over this partial's output):
  * cosine DESCENDING with SQL double semantics — null (zero-norm /
  * length-mismatch cosines) below every number, NaN above every number —
  * then dst ASCENDING as the tiebreak. `java.lang.Double.compare` gives
  * the NaN arm; the null arm is explicit. (−0.0 ordering, where
  * Double.compare and Spark differ, is unreachable for cosines — see the
  * call-site note.) The kept set under this TOTAL order is unique, so
  * the combiner is row-order-independent and retries are deterministic.
  */
object KnnTopK {

  /** Is candidate (c1, d1) strictly better than (c2, d2)? */
  private def better(c1: java.lang.Double, d1: Long,
                     c2: java.lang.Double, d2: Long): Boolean = {
    if (c1 == null || c2 == null) {
      if (c1 == null && c2 == null) d1 < d2
      else c2 == null // a number beats null; null never beats a number
    } else {
      val cmp = java.lang.Double.compare(c1, c2)
      if (cmp != 0) cmp > 0 else d1 < d2
    }
  }

  /** Sorted-array top-k accumulator (k is small — the graph degree). */
  private final class Top(k: Int) {
    private val cos = new Array[java.lang.Double](k)
    private val dst = new Array[Long](k)
    private var n = 0
    def offer(c: java.lang.Double, d: Long): Unit = {
      if (n == k && !better(c, d, cos(n - 1), dst(n - 1))) return
      var i = if (n < k) n else n - 1
      while (i > 0 && better(c, d, cos(i - 1), dst(i - 1))) {
        cos(i) = cos(i - 1); dst(i) = dst(i - 1); i -= 1
      }
      cos(i) = c; dst(i) = d
      if (n < k) n += 1
    }
    def emit(src: Long): Iterator[(Long, Long, Option[Double])] =
      (0 until n).iterator.map(i =>
        (src, dst(i), Option(cos(i)).map(_.doubleValue)))
  }

  /** One task's combine: pairs (ida, idb, cosine) → ≤ k rows per node. */
  def combine(it: Iterator[(Long, Long, Option[Double])], k: Int)
      : Iterator[(Long, Long, Option[Double])] = {
    val tops = new java.util.HashMap[Long, Top]
    it.foreach { case (a, b, c) =>
      val cBoxed: java.lang.Double = c.map(Double.box).orNull
      var t = tops.get(a)
      if (t == null) { t = new Top(k); tops.put(a, t) }
      t.offer(cBoxed, b)
      var u = tops.get(b)
      if (u == null) { u = new Top(k); tops.put(b, u) }
      u.offer(cBoxed, a)
    }
    import scala.jdk.CollectionConverters._
    tops.entrySet().iterator().asScala.flatMap(e => e.getValue.emit(e.getKey))
  }
}
