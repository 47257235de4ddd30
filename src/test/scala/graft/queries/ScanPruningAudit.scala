package graft.queries

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shared plan-walking for the scan-pruning sweep: every parquet/orc scan
  * in a query's physical plan (recursing through AQE wrappers and
  * subqueries), with the column set the scan actually reads.
  */
object ScanPruning {

  /** The columns that ARE the data at 100 TB: document bodies, embedding
    * vectors, raw event payloads. Reading one of these from a scan that
    * doesn't need it turns a metadata-class query into a full-corpus read.
    */
  val heavyColumns: Set[String] = Set("text", "embedding", "props")

  /** All V1 file scans under `p`, recursing into AQE-wrapped subplans and
    * subqueries (scalar subqueries hide broadcast-side scans).
    */
  def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collectWithSubqueries {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten

  /** The heavy columns `name`'s plan reads, with the scan's source path
    * basename for the audit trail: e.g. `text@documents.parquet`.
    */
  def heavyReads(plan: SparkPlan): Seq[String] =
    scans(plan).flatMap { s =>
      val src = s.relation.location.rootPaths.headOption
        .map(_.getName).getOrElse("?")
      s.requiredSchema.fieldNames.filter(heavyColumns).map(c => s"$c@$src")
    }.distinct.sorted

  /** Shuffle-exchange count of the (initial, pre-AQE) physical plan,
    * recursing through AQE wrappers and subqueries. Broadcast exchanges
    * are NOT counted — a broadcast is the cheap alternative a shuffle
    * budget exists to protect.
    */
  def shuffleCount(p: SparkPlan): Int =
    p.collectWithSubqueries {
      // collect recurses into matched nodes' children, so each exchange
      // contributes exactly 1; AQE wrappers are leaves whose inner plan
      // must be walked explicitly
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
    }.sum
}

/** One-off audit: print, for every catalog query, which heavy columns its
  * scans read and from where — the population from which ScanPruningSpec's
  * allowlist was built. `Test/runMain graft.queries.ScanPruningAudit`.
  */
object ScanPruningAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val d = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val reads =
        try ScanPruning.heavyReads(q(spark, d).queryExecution.executedPlan)
        catch { case scala.util.control.NonFatal(e) => Seq(s"ERR ${e.getMessage}") }
      if (reads.nonEmpty) println(s"$name -> ${reads.mkString(", ")}")
    }
    spark.stop()
  }
}
