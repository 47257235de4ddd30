package graft.semantic

import org.apache.spark.sql.SparkSession
import graft.core.TableStore

/** The reference's semantic model, verbatim: `review_metrics` over
  * `fact_reviews` × 5 appid-grain dims —
  * `/root/reference/src/notebooks/modelling/semantic_layer.sql:7-94` —
  * 11 dimensions, 5 measures, view-level not-null filter, intentional
  * 1:many fan-out on the aux-dim joins (SURVEY.md §7.4.3).
  */
object ReviewMetrics {

  def apply(store: TableStore): MetricView = MetricView(
    source = store.fqn("fact", "reviews"),
    // `semantic_layer.sql:14`
    filter = Some("weighted_score IS NOT NULL"),
    joins = Seq(
      // `semantic_layer.sql:15-30` — all on the degenerate key appid
      MetricJoin("games", store.fqn("dim", "games"),
        "source.appid = games.appid"),
      MetricJoin("categories", store.fqn("dim", "categories"),
        "source.appid = categories.appid"),
      MetricJoin("genres", store.fqn("dim", "genres"),
        "source.appid = genres.appid"),
      MetricJoin("publishers", store.fqn("dim", "publishers"),
        "source.appid = publishers.appid"),
      MetricJoin("developers", store.fqn("dim", "developers"),
        "source.appid = developers.appid")),
    dimensions = Seq(
      // `semantic_layer.sql:31-75`
      Dimension("app_id", "source.appid"),
      Dimension("review_language", "source.language"),
      Dimension("review_date", "CAST(source.updated_at AS DATE)"),
      Dimension("sponsored", "source.sponsored_review"),
      Dimension("game_name", "games.name", join = Some("games")),
      Dimension("release_date", "games.release_date", join = Some("games")),
      Dimension("on_sale", "games.on_sale", join = Some("games")),
      Dimension("category", "categories.name", join = Some("categories")),
      Dimension("genre", "genres.name", join = Some("genres")),
      Dimension("publisher", "publishers.name", join = Some("publishers")),
      Dimension("developer", "developers.name", join = Some("developers"))),
    measures = Seq(
      // `semantic_layer.sql:76-93`
      Measure("review_count", "CAST(COUNT(*) AS BIGINT)"),
      Measure("avg_weighted_score", "AVG(weighted_score)"),
      Measure("positive_review_pct",
        "CAST(SUM(CASE WHEN weighted_score > 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"),
      Measure("negative_review_pct",
        "CAST(SUM(CASE WHEN weighted_score < 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"),
      Measure("median_review_length",
        "percentile(length(review_text), 0.5)",
        sqlExpr = Some("quantile_cont(length(review_text), 0.5)"))))

  /** Catalog documentation ≙ `semantic_layer.sql:103-139` (K4): table
    * properties + per-column comments on the published tables.
    */
  def applyCatalogComments(spark: SparkSession, store: TableStore): Unit = {
    val fact = store.fqn("fact", "reviews")
    spark.sql(s"ALTER TABLE $fact SET TBLPROPERTIES ('comment' = " +
      "'Steam review facts with LLM sentiment scores, one row per review')")
    Seq(
      "appid" -> "Steam application id (degenerate dim key)",
      "recommendationid" -> "unique review id (primary key)",
      "sentiment_score" -> "LLM rubric score in {-5,-2,0,1,2,5}",
      "weighted_score" -> "sentiment_score halved for sponsored reviews"
    ).foreach { case (c, comment) =>
      // Spark's form of the reference's COMMENT ON COLUMN
      spark.sql(s"ALTER TABLE $fact ALTER COLUMN $c COMMENT '$comment'")
    }
  }
}
