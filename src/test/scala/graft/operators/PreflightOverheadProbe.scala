package graft.operators

import org.apache.spark.sql.functions.col

/** One-off audit: measure what the opt-in pair-volume preflight
  * actually costs on a real corpus — the scaladoc claims "two count
  * aggregations over a persisted keyed frame, roughly one extra
  * materialization of the signature+banding work", and this prints the
  * number instead of asserting the theory (the round-12/13 discipline:
  * wall-clock claims get measured, at the biggest tier available).
  *
  * Run: `sbt "Test/runMain graft.operators.PreflightOverheadProbe [dir]"`
  * — dir defaults to the sf1 tier (generated on demand by the build
  * gate); pass /root/testdata/sf0.1 for the small tier. Best-of-3 per
  * form, guarded budget far above the corpus's real pair factor so both
  * forms run the identical join to completion.
  */
object PreflightOverheadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val dir = args.headOption.getOrElse {
      require(graft.Sf1Tier.available(spark), "sf1 tier unavailable")
      graft.Sf1Tier.dir
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"corpus: ${docs.count()} docs @ $dir")
    def time(label: String)(body: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = runs.map(_._1).min
      println(f"$label%-12s best-of-3 $best%.2f s  (pairs ${runs.head._2})")
    }
    time("unguarded") {
      TextDedup.minHashLshPairs(docs, "doc_id", "text").count()
    }
    time("guarded") {
      TextDedup.minHashLshPairs(docs, "doc_id", "text",
        maxPairFactor = Some(64.0)).count()
    }
    spark.stop()
  }
}
