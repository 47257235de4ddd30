package graft.pipeline

/** Minimal DAG runner ≙ the Databricks Jobs workflow
  * (`/root/reference/src/job/workflow.json`, SURVEY.md §2.10):
  * stages with explicit dependencies, topological sequential execution,
  * fail-fast (`run_if: ALL_SUCCESS`).
  */
final case class Stage(name: String, deps: Seq[String] = Nil)(val run: () => Unit)

object Pipeline {

  /** Run stages in dependency order; any failure aborts the rest
    * (downstream of the reference's quality gate never runs on error —
    * `workflow.json:49-79`). Returns the executed order.
    */
  def run(stages: Seq[Stage]): Seq[String] = {
    val byName = stages.map(s => s.name -> s).toMap
    stages.foreach(s => s.deps.foreach(d =>
      require(byName.contains(d), s"stage ${s.name}: unknown dep $d")))
    var done = Vector.empty[String]
    var remaining = stages
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(done.contains))
      require(ready.nonEmpty,
        s"dependency cycle among: ${remaining.map(_.name).mkString(", ")}")
      ready.foreach { s => s.run(); done :+= s.name }
      remaining = blocked
    }
    done
  }
}
