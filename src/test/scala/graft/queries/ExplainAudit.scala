package graft.queries
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("st5_stream_static_enrich", "ts1_resample_gaps")) {
      println(s"===== $q")
      val plan = graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
        l.contains("WholeStageCodegen") || l.contains("Generate")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
