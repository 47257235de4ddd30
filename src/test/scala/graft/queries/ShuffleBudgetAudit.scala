package graft.queries

/** One-off audit: print every catalog query's shuffle-exchange count as
  * Scala map-entry lines — the population from which ShuffleBudgetSpec's
  * budget table was built (and is regenerated after a deliberate plan
  * change). `Test/runMain graft.queries.ShuffleBudgetAudit`.
  */
object ShuffleBudgetAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val d = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val n =
        try ScanPruning.shuffleCount(q(spark, d).queryExecution.executedPlan)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"$name ERR ${e.getMessage}"); -1 }
      println(s"""    "$name" -> $n,""")
    }
    spark.stop()
  }
}
