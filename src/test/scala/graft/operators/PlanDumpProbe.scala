package graft.operators

import org.apache.spark.sql.functions._

/** One-off audit: dump the NORMALIZED physical plan of the bm25_1
  * catalog shape (expression IDs and plan IDs masked), so two TREES can
  * be diffed for plan identity — the round-18 instrument behind the
  * claim that the catalog's forced-broadcast posture plans
  * byte-identically to the pre-gate (round-16) unconditional hint.
  * `Bm25RoutePlanSpec` pins auto==forced WITHIN a tree; this probe is
  * the cross-tree half: run it in two git worktrees, diff the output
  * between the PLANSTART/PLANEND markers (empty diff = identical
  * plans). Round-18 result: pre-gate vs r18 forced — IDENTICAL.
  *
  * Run: `sbt "Test/runMain graft.operators.PlanDumpProbe"`.
  */
object PlanDumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        array_join(slice(graft.functions.TextAnalysis.tokens(col("text")), 1, 6), " ")
          .as("qtext"))
    val df = Retrieval.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext",
      k = 10, broadcastQueryTerms = Some(true))
    val norm = df.queryExecution.executedPlan.toString
      .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
    println("PLANSTART")
    println(norm)
    println("PLANEND")
    spark.stop()
  }
}
