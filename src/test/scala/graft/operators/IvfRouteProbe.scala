package graft.operators

import org.apache.spark.sql.functions.{array, col, lit, sin}

/** One-off audit: measure what the round-16 probe-join route actually
  * trades — the broadcast shape vs the shuffled equi-join + two-stage
  * top-k shape, forced both ways on identical inputs, at a tier where
  * the join does real work.
  *
  * WHAT THIS CAN AND CANNOT SHOW: local[n] runs both shapes inside one
  * JVM, so the broadcast pays no network fan-out and no per-executor
  * memory pressure — the two costs that make an oversized broadcast
  * FATAL on a cluster. The probe therefore measures the equi-join
  * path's OVERHEAD (its extra shuffle + partial window) in the regime
  * where the broadcast is still feasible, i.e. the premium a caller
  * pays near the budget boundary for the shape that cannot OOM. The
  * 100 TB argument for the gate itself is structural (a 5 GB hashed
  * relation per executor is not a tuning question); what must be
  * measured is that the alternative shape is HEALTHY, not that the
  * broadcast eventually dies.
  *
  * Two query-side shapes against a synthetic 64-d corpus
  * (deterministic, the IvfGuardOverheadProbe recipe), C = √n sizing:
  *  - `corpus`: queries = the corpus itself (the batch-inference /
  *    graph shape the gate exists for — above the budget at 64k rows)
  *  - `slice`: a 1k-query bounded slice (the catalog shape — far below
  *    the budget, where the gate keeps the broadcast)
  *
  * Run: `sbt "Test/runMain graft.operators.IvfRouteProbe [n]"` — n
  * defaults to 64000. A/B interleave, min per form, untimed warmup.
  */
object IvfRouteProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val n = args.headOption.map(_.toLong).getOrElse(64000L)
    println(s"synthetic corpus: $n vectors, 64-d")
    val emb = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 64).map(i =>
        sin(col("id") * lit(0.61 + i * 0.137) + lit(i))): _*)
        .as("embedding"))
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = Similarity.ivfSizing(n))
    def ab(label: String)(bc: => Long)(eq: => Long): Unit = {
      def shot(body: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      bc // untimed warmup
      val pairs = (1 to 3).map(_ => (shot(bc), shot(eq)))
      val (b, e) = (pairs.map(_._1._1).min, pairs.map(_._2._1).min)
      println(f"$label%-7s broadcast $b%.2f s  equi-join $e%.2f s  " +
        f"(eq/bc ${e / b}%.2fx, rows ${pairs.head._1._2})")
    }
    ab("corpus") {
      Similarity.ivfTopK(index, emb, "vec_id", "embedding", k = 5,
        nProbe = 2, broadcastQueries = Some(true)).count()
    } {
      Similarity.ivfTopK(index, emb, "vec_id", "embedding", k = 5,
        nProbe = 2, broadcastQueries = Some(false)).count()
    }
    val slice = emb.filter(col("vec_id") % 64 === 0) // ~1k queries
    ab("slice") {
      Similarity.ivfTopK(index, slice, "vec_id", "embedding", k = 5,
        nProbe = 2, broadcastQueries = Some(true)).count()
    } {
      Similarity.ivfTopK(index, slice, "vec_id", "embedding", k = 5,
        nProbe = 2, broadcastQueries = Some(false)).count()
    }
    spark.stop()
  }
}
