package graft.queries

/** One-off audit: print every catalog query's shuffle-exchange count as
  * Scala map-entry lines — the population from which ShuffleBudgetSpec's
  * budget table was built (and is regenerated after a deliberate plan
  * change). Plans under the SAME session and tier as the spec, so a
  * regenerated budget is reproducible by the gate; a query that fails to
  * plan goes to stderr and is OMITTED from the paste block (a pasted
  * `-1` could never pass). Optional args as in [[ScanPruningAudit]]:
  * `Test/runMain graft.queries.ShuffleBudgetAudit [sfDir] [q1,q2]`.
  */
object ShuffleBudgetAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val d = args.headOption.getOrElse(CatalogPlans.defaultSf)
    val only = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    CatalogPlans.compute(spark, d, only).foreach { case (name, plan) =>
      try println(s"""    "$name" -> ${ScanPruning.shuffleCount(plan)},""")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"$name ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
