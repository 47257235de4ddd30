package graft.pipeline

/** Minimal DAG runner ≙ the Databricks Jobs workflow
  * (`/root/reference/src/job/workflow.json`, SURVEY.md §2.10):
  * stages with explicit dependencies, topological sequential execution,
  * fail-fast (`run_if: ALL_SUCCESS`).
  */
final case class Stage(name: String, deps: Seq[String] = Nil)(val run: () => Unit)

object Pipeline {

  /** Workflow-level trigger contract ≙ `workflow.json:8-13,94-96`: the
    * reference job fires on a daily Quartz cron with
    * `max_concurrent_runs = 1` — a trigger that lands while a run is active
    * is QUEUED, never dropped and never run concurrently. Cron firing
    * itself belongs to the scheduler; the semantics the engine must honor
    * is this serialization + FIFO-queueing guarantee, which `Runner`
    * models: `submit` executes immediately when a slot is free and queues
    * otherwise, draining after each completion.
    */
  final class Runner(maxConcurrent: Int = 1) {
    require(maxConcurrent >= 1, s"maxConcurrent must be >= 1")
    private var active = 0
    private val queue = scala.collection.mutable.Queue.empty[Seq[Stage]]
    private var executed = Vector.empty[Seq[String]]

    def submit(stages: Seq[Stage]): Unit = synchronized {
      if (active >= maxConcurrent) queue.enqueue(stages)
      else runNow(stages)
    }

    private def runNow(stages: Seq[Stage]): Unit = {
      active += 1
      try executed :+= Pipeline.run(stages)
      finally active -= 1
      // drain anything queued during the run (re-check the slot each time:
      // a drained run may itself queue more)
      while (queue.nonEmpty && active < maxConcurrent) runNow(queue.dequeue())
    }

    /** Stage orders of completed runs, in completion order. */
    def completedRuns: Seq[Seq[String]] = synchronized(executed)
  }

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
