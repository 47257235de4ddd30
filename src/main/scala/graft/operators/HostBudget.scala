package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host document budgets — the crawl-diversity guard of web-corpus
  * curation (C4 caps pages per URL, RefinedWeb/Dolma cap per registered
  * domain): without it, a handful of mega-hosts (forums, wikis, mirrors)
  * dominate the token mix and the model overfits their register. The cap
  * is a POLICY operator, not a dedup: the dropped rows are real distinct
  * documents, deliberately rationed.
  *
  * Shape at scale: the rank rides a `row_number <= k` window whose limit
  * Spark's InferWindowGroupLimit pushes into a pre-shuffle partial
  * group-limit — every map task forwards at most k rows per host, so a
  * 10⁸-page host never concentrates in one task. The pre-cap size
  * (`host_total`) deliberately does NOT share that window: a
  * count-over-partition in the same spec would block the group-limit
  * rewrite (the rule fires only when every window function is rank-like)
  * and force whole-host buffering — it comes from a groupBy on the same
  * key joined back instead (partial-aggregated, compact (host, count)
  * rows). The deterministic `orderCols` tie-break makes the kept set
  * replayable across runs — a re-crawl keeps the same survivors, so
  * downstream incremental dedup ([[TextDedup.bloomNewDocs]]) sees a
  * stable corpus.
  */
object HostBudget {

  /** Keep at most `maxPerHost` rows per host, preferring lowest
    * `orderCols`. Appends `host_rank` (1-based within host) and
    * `host_total` (pre-cap size of the host, for the rationing report).
    */
  def capPerHost(df: DataFrame, hostCol: String, orderCols: Seq[Column],
                 maxPerHost: Int): DataFrame = {
    require(maxPerHost >= 1, s"maxPerHost must be >= 1: $maxPerHost")
    require(!df.columns.contains("_hb_host"),
      "capPerHost: input already has a column named _hb_host (reserved)")
    val w = Window.partitionBy(col(hostCol)).orderBy(orderCols: _*)
    // null-safe join key: a null host (malformed URL) is one partition to
    // the window and must stay one capped group here too, not vanish
    // through null-unsafe equality
    val totals = df.groupBy(col(hostCol))
      .agg(count(lit(1)).as("host_total"))
      .withColumnRenamed(hostCol, "_hb_host")
    df.withColumn("host_rank", row_number().over(w).cast("int"))
      .filter(col("host_rank") <= maxPerHost)
      .join(totals, col(hostCol) <=> col("_hb_host"))
      .drop("_hb_host")
  }
}
