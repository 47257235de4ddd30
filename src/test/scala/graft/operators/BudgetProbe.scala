package graft.operators

import org.apache.spark.sql.functions._

/** One-off timing probe (not a spec): generic vs histogram-pruned budget
  * fill on a real tier — `Test/runMain graft.operators.BudgetProbe [dir]`.
  * Context for the numbers: in a COLD forked JVM the pruned form's extra
  * jobs (score-cut agg, band agg, boundary window, threshold min — all
  * compact-key) each pay interpreter/JIT warmup, so it measures several ×
  * the generic form at test scale; warm best-of-2 (the Bench method)
  * shows the same constant-overhead gap shrinking with data size. The
  * prune's value is asymptotic — the generic window sorts each entire
  * group in ONE task, the pruned one only the ~budget-sized head — which
  * no sf-tier this small can exhibit; CorpusBudgetSpec carries the
  * equality + subset proof obligations instead.
  */
object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$d/documents.parquet").select(
      col("doc_id"), col("source"),
      graft.functions.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.functions.TextAnalysis.estimatedBpeTokens(col("text"))
        .as("n_tokens"))
    noop(docs) // warm the scan + derivations
    for (round <- 1 to 2) {
      time(s"generic-$round")(noop(CorpusBudget.budgetFill(docs, "source",
        "n_tokens", 1000L, Seq(col("q").desc, col("doc_id")))))
      time(s"survivors-$round")(noop(CorpusBudget.pruneByScore(docs,
        "source", "n_tokens", 1000L, col("q"), 64)))
      time(s"pruned-$round")(noop(CorpusBudget.budgetFillByScore(docs,
        "source", "n_tokens", 1000L, col("q"), Seq(col("doc_id")))))
    }
    spark.stop()
  }
}
