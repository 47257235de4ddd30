package graft.operators

/** One-off plan probe (not a spec): does a catalog query's executed plan
  * carry a WindowGroupLimit, and what window/exchange/sort nodes does it
  * run? `Test/runMain graft.operators.HostPlanProbe [query] [sfDir]`.
  */
object HostPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val q = args.headOption.getOrElse("hc1_host_cap")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val df = graft.SparkEntry.queries(q)(spark, d)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("HAS-WGL " + plan.contains("WindowGroupLimit"))
    println(plan.linesIterator.filter(l =>
      l.contains("Window") || l.contains("Exchange") || l.contains("Sort"))
      .mkString("\n"))
    spark.stop()
  }
}
