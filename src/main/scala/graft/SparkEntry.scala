package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked catalog: one entry per operator of
  * SURVEY.md §2 plus the training-data-pipeline extensions. Each query takes
  * (session, scale-factor dir) and returns a deterministic DataFrame;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-chain aggregate exercises scan → multi-join → group-agg.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j4_star_chain")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every query is wrapped with [[QueryUtil.finalizeDecimals]]: decimal
    * arithmetic stays internal for reduction-order determinism, but final
    * DECIMAL columns are emitted as DOUBLE so both engines hash identically
    * (the oracle SQL mirrors with `CAST(CAST(x AS DECIMAL) AS DOUBLE)`).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (CoreQueries.queries ++ SemanticQueries.queries ++
      DataPipelineQueries.queries ++ StreamMiscQueries.queries ++
      FlagshipQueries.queries ++ TrainPrepQueries.queries ++
      CatalogOpsQueries.queries ++ RetrievalQueries.queries ++
      BpeQueries.queries ++ SketchStatQueries.queries).map { case (name, q) =>
      name -> { (s: SparkSession, d: String) =>
        QueryUtil.finalizeDecimals(q(s, d))
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables.
    *
    * Every catalog entry has an oracle. The ones that weren't directly
    * SQL-expressible are checked on a checkable consequence instead:
    * `d3_simhash` emits the planted md5-equal-pairs-at-hamming-0 invariant;
    * `sim2_ivf_topk` emits a per-query recall@5-vs-brute-force boolean
    * (both engine-internal hash/centroid states stay spec-verified); the
    * multimodal stub decodes (`mm2`/`mm3` — no codec libraries in this
    * environment) emit md5/length-derived values DuckDB recomputes exactly,
    * so the full mapPartitions plumbing is hash-compared end to end.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ SemanticQueries.oracle ++
      DataPipelineQueries.oracle ++ StreamMiscQueries.oracle ++
      FlagshipQueries.oracle ++ TrainPrepQueries.oracle ++
      CatalogOpsQueries.oracle ++ RetrievalQueries.oracle ++
      BpeQueries.oracle ++ SketchStatQueries.oracle
}
