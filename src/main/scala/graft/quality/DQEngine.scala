package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-quality rule engine.
  *
  * Ports the DQX usage of `/root/reference/src/notebooks/data_quality.py:24-46`
  * (SURVEY.md §2.9 U3): declarative rules produce an `_errors` array column;
  * any error row fails the pipeline (the reference raises, blocking the
  * semantic-layer task — `workflow.json:49-79`).
  *
  * Scale note: `IsUnique` uses a window count over the key columns — one
  * hash-shuffle by key, no driver-side collect, so it holds at 100TB; row
  * rules are pure projections (codegen'd, no shuffle).
  */
sealed trait DQRule {
  def name: String
  def criticality: String // "error" fails the gate; "warn" is recorded only
}

/** ≙ DQX `is_unique` dataset rule (`data_quality.py:25-29`). */
final case class IsUnique(columns: Seq[String],
                          criticality: String = "error") extends DQRule {
  val name = s"is_unique_${columns.mkString("_")}"
}

/** ≙ DQX `is_in_range` row rule (`data_quality.py:30-35`). */
final case class IsInRange(column: String, min: Double, max: Double,
                           criticality: String = "error") extends DQRule {
  val name = s"is_in_range_$column"
}

final case class IsNotNull(column: String,
                           criticality: String = "error") extends DQRule {
  val name = s"is_not_null_$column"
}

final class DQViolationException(msg: String) extends RuntimeException(msg)

object DQEngine {

  /** Violation predicate (true = rule violated) for one rule. */
  private def violation(rule: DQRule): Column = rule match {
    case IsUnique(cols, _) =>
      count(lit(1)).over(Window.partitionBy(cols.map(col): _*)) > 1
    case IsInRange(c, min, max, _) =>
      !col(c).between(min, max) || col(c).isNull
    case IsNotNull(c, _) => col(c).isNull
  }

  /** ≙ DQX `apply_checks` (`data_quality.py:37-39`): append `_errors` and
    * `_warnings` array&lt;string&gt; columns naming each violated rule.
    */
  def applyChecks(df: DataFrame, rules: Seq[DQRule]): DataFrame = {
    def arr(crit: String): Column = {
      val checks = rules.filter(_.criticality == crit)
        .map(r => when(violation(r), lit(r.name)))
      if (checks.isEmpty) array().cast("array<string>")
      else filter(array(checks: _*), x => x.isNotNull)
    }
    df.withColumn("_errors", arr("error"))
      .withColumn("_warnings", arr("warn"))
  }

  /** ≙ the fail-the-job gate (`data_quality.py:40-46`). */
  def gate(checked: DataFrame): Unit = {
    val nErrors = checked.filter(size(col("_errors")) > 0).count()
    if (nErrors > 0)
      throw new DQViolationException(
        s"$nErrors rows failed data-quality checks")
  }
}
