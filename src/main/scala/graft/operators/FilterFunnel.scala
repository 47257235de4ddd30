package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-funnel accounting — the observability face of a curation
  * cascade: for an ORDERED rule list, how many documents entered each
  * rule, how many it dropped, how many survived. Production pipelines
  * watch exactly this table per ingest batch (a rule that suddenly drops
  * 40% instead of 4% is a data incident, not a code change).
  *
  * Shape at scale: ONE aggregation pass over the input — each rule
  * becomes a conditional sum over the cumulative conjunction of the rules
  * before it (a row reaches rule i iff it passed rules 0..i-1) — then the
  * single result row explodes into one report row per rule. No joins, no
  * per-rule scans, map-side combinable.
  */
object FilterFunnel {

  /** `keep` is the PASS predicate; a NULL evaluation counts as a drop
    * (documents with missing fields must not silently sail through).
    */
  final case class Rule(name: String, keep: Column)

  def funnelReport(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "funnel needs at least one rule")
    // cumulative pass condition after rule i (1-based)
    val cumPass: Seq[Column] = rules
      .scanLeft(lit(true)) { case (acc, r) => acc && coalesce(r.keep, lit(false)) }
      .tail
    val aggs = count(lit(1)).cast("bigint").as("_s0") +:
      cumPass.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).cast("bigint").as(s"_s${i + 1}")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val reportRows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(i + 1).cast("int").as("step"), lit(r.name).as("rule"),
        col(s"_s$i").as("n_in"), col(s"_s${i + 1}").as("n_out"))
    }
    one.select(explode(array(reportRows: _*)).as("r"))
      .select(col("r.step").as("step"), col("r.rule").as("rule"),
        col("r.n_in").as("n_in"),
        (col("r.n_in") - col("r.n_out")).as("n_dropped"),
        col("r.n_out").as("n_out"))
  }

  /** The surviving rows themselves (all rules pass) — the funnel's output
    * side; `funnelReport` is its accounting side, same predicates.
    */
  def survivors(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df) { case (acc, r) =>
      acc.filter(coalesce(r.keep, lit(false)))
    }
}
