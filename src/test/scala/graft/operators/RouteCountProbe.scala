package graft.operators

import org.apache.spark.sql.functions.col

/** One-off audit: what the auto route's eager row estimate actually
  * costs a repeated bounded-slice caller (the round-16 verdict's item 5
  * / round-16 ADVICE concern), and that the round-17 proven-bound fast
  * path ([[Broadcasts.provenMaxRows]]) removes it where Catalyst can
  * prove the bound.
  *
  * Three shapes, auto route (`None`) vs forced broadcast (`Some(true)`)
  * on identical inputs — the delta IS the estimate's cost, since below
  * the budget both choose the same plan:
  *
  *  - `proven`: queries = a `.limit(512)` slice — `maxRows` proves the
  *    bound, the auto route runs NO construction-time job; expected
  *    ≈1.0×.
  *  - `derived`: queries = a FILTER over the corpus (`maxRows` is
  *    unprovable past a filter on a relation) — the auto route pays one
  *    `count()` that re-scans the corpus upstream; this is the shape
  *    the scaladoc tells loop callers to force.
  *  - `bm25`: the retrieval route on the sf1 documents — the qt count
  *    pays the query-side tokenize + distinct once extra.
  *
  * A/B interleave, min per form, untimed warmup (the
  * `IvfGuardOverheadProbe.ab` protocol — sequential best-of-N biases
  * the first form 10-30% slow on this box).
  *
  * Run: `sbt "Test/runMain graft.operators.RouteCountProbe [dir]"` —
  * dir defaults to the sf1 tier. `--synth n` swaps in the
  * deterministic n-row 64-d corpus (the `IvfRouteProbe` recipe,
  * vector shapes only) to separate fixed job constants from
  * data-proportional cost — the sf1 embeddings are only 8k rows, where
  * every ratio is constant-dominated.
  */
object RouteCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val synthN = if (args.headOption.contains("--synth"))
      Some(args(1).toLong) else None
    val dir = if (synthN.isDefined) "" else args.headOption.getOrElse {
      require(graft.Sf1Tier.available(spark), "sf1 tier unavailable")
      graft.Sf1Tier.dir
    }
    import org.apache.spark.sql.functions.{array, lit, sin}
    val emb = synthN match {
      case Some(n) =>
        // parquet-backed like the real corpus: a bare range re-executes
        // for free and its maxRows is provable, both of which would
        // erase exactly the upstream re-scan cost under measurement
        val p = s"/tmp/graft-routecount-synth-$n"
        if (!new java.io.File(p + "/_SUCCESS").isFile)
          spark.range(n).select(col("id").as("vec_id"),
            array((0 until 64).map(i =>
              sin(col("id") * lit(0.61 + i * 0.137) + lit(i))): _*)
              .as("embedding"))
            .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      case None => spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
    }
    println(s"corpus: ${emb.count()} vectors @ " +
      synthN.map(n => s"synth $n").getOrElse(dir))
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = Similarity.ivfSizing(emb.count())) // built once, untimed

    def ab(label: String)(auto: => Long)(forced: => Long): Unit = {
      def shot(body: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      forced // untimed warmup
      val pairs = (1 to 3).map(_ => (shot(auto), shot(forced)))
      val (a, f) = (pairs.map(_._1._1).min, pairs.map(_._2._1).min)
      println(f"$label%-8s auto $a%.3f s  forced $f%.3f s  " +
        f"(auto/forced ${a / f}%.2fx, rows ${pairs.head._1._2})")
    }

    val proven = emb.limit(512)
    ab("proven") {
      Similarity.ivfTopK(index, proven, "vec_id", "embedding",
        k = 5, nProbe = 2).count()
    } {
      Similarity.ivfTopK(index, proven, "vec_id", "embedding",
        k = 5, nProbe = 2, broadcastQueries = Some(true)).count()
    }

    val derived = emb.filter(col("vec_id") % 16 === 0)
    ab("derived") {
      Similarity.ivfTopK(index, derived, "vec_id", "embedding",
        k = 5, nProbe = 2).count()
    } {
      Similarity.ivfTopK(index, derived, "vec_id", "embedding",
        k = 5, nProbe = 2, broadcastQueries = Some(true)).count()
    }

    if (synthN.isEmpty) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val qs = docs.filter(col("doc_id") < 16)
        .select(col("doc_id").as("qid"), col("text").as("qtext"))
      ab("bm25") {
        Retrieval.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext",
          k = 10).count()
      } {
        Retrieval.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext",
          k = 10, broadcastQueryTerms = Some(true)).count()
      }
    }
    spark.stop()
  }
}
