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
  * Shape at scale: one shuffle on the host key, then a rank and a
  * partition count computed in the same window partition (one Exchange,
  * two Window nodes over it). Per-host state is a counter, not a buffer —
  * a 10⁸-page host costs rank arithmetic, never memory. The deterministic
  * `orderCols` tie-break makes the kept set replayable across runs — a
  * re-crawl keeps the same survivors, so downstream incremental dedup
  * ([[TextDedup.bloomNewDocs]]) sees a stable corpus.
  */
object HostBudget {

  /** Keep at most `maxPerHost` rows per host, preferring lowest
    * `orderCols`. Appends `host_rank` (1-based within host) and
    * `host_total` (pre-cap size of the host, for the rationing report).
    */
  def capPerHost(df: DataFrame, hostCol: String, orderCols: Seq[Column],
                 maxPerHost: Int): DataFrame = {
    require(maxPerHost >= 1, s"maxPerHost must be >= 1: $maxPerHost")
    val part = Window.partitionBy(col(hostCol))
    val w = part.orderBy(orderCols: _*)
    df.withColumn("host_rank", row_number().over(w).cast("int"))
      .withColumn("host_total", count(lit(1)).over(part))
      .filter(col("host_rank") <= maxPerHost)
  }
}
