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

  /** The reference's ACTUAL metric-view document: the YAML body of
    * `CREATE VIEW review_metrics WITH METRICS LANGUAGE YAML`
    * (`/root/reference/src/notebooks/modelling/semantic_layer.sql:11-94`),
    * reproduced verbatim — template placeholders, display_names, comments
    * and all. This is DATA the engine must execute, not code: the analyst
    * authors this document, [[MetricViewYaml.parse]] compiles it (with
    * Databricks-widget-style `${var}` substitution), and
    * `m8_review_metrics_yaml` hash-checks a compiled metric query against
    * the DuckDB oracle over a deterministic reviews star.
    */
  val yamlDocument: String =
    """  version: 1.1
      |  comment: "KPIs for Reviews"
      |  source: ${catalog}.${environment}.fact_reviews
      |  filter: weighted_score IS NOT NULL
      |  joins:
      |    - name: dim_games
      |      source: ${catalog}.${environment}.dim_games
      |      on: source.appid = dim_games.appid
      |    - name: dim_categories
      |      source: ${catalog}.${environment}.dim_categories
      |      on: source.appid = dim_categories.appid
      |    - name: dim_genres
      |      source: ${catalog}.${environment}.dim_genres
      |      on: source.appid = dim_genres.appid
      |    - name: dim_publishers
      |      source: ${catalog}.${environment}.dim_publishers
      |      on: source.appid = dim_publishers.appid
      |    - name: dim_developers
      |      source: ${catalog}.${environment}.dim_developers
      |      on: source.appid = dim_developers.appid
      |  dimensions:
      |    - name: release_date
      |      expr: dim_games.release_date
      |      display_name: 'Release Date'
      |      comment: 'Release Date of the Game'
      |    - name: review_date
      |      expr: source.updated_at
      |      display_name: 'Review Date'
      |      comment: 'Date when review was updated'
      |    - name: name
      |      expr: dim_games.name
      |      display_name: 'Game Name'
      |      comment: 'Name of the Game'
      |    - name: runs_on_windows
      |      expr: dim_games.supports_windows
      |      display_name: 'Runs on Windows'
      |      comment: 'Whether game runs on Windows'
      |    - name: runs_on_mac
      |      expr: dim_games.supports_mac
      |      display_name: 'Runs on MacOS'
      |      comment: 'Whether game runs on MacOS'
      |    - name: runs_on_linux
      |      expr: dim_games.supports_linux
      |      display_name: 'Runs on Linux'
      |      comment: 'Whether game runs on Linux'
      |    - name: metacritic_score
      |      expr: dim_games.metacritic_score
      |      display_name: 'Metacritic Score'
      |      comment: 'Average rating of game on website Metacritic'
      |    - name: developer
      |      expr: dim_developers.name
      |      display_name: 'Name of Developer'
      |      comment: 'Name of the company / person who has developed the game'
      |    - name: publisher
      |      expr: dim_publishers.name
      |      display_name: 'Name of Publisher'
      |      comment: 'Name of the company / person who has published the game'
      |    - name: genre
      |      expr: dim_genres.name
      |      display_name: 'Genres of game'
      |      comment: 'Game Genres'
      |    - name: category
      |      expr: dim_categories.name
      |      display_name: 'Categories of game'
      |      comment: 'Game Categories'
      |  measures:
      |    - name: review_count
      |      expr: COUNT(*)
      |    - name: avg_weighted_score
      |      expr: AVG(weighted_score)
      |      display_name: 'Average Review Score'
      |      comment: 'Average of the sentiment score generated by AI'
      |    - name: positive_review_pct
      |      expr: SUM(CASE WHEN weighted_score > 0 THEN 1 ELSE 0 END) / COUNT(*)
      |      display_name: 'Postive Review Percentage'
      |      comment: 'Percentage of reviews with positive sentiment'
      |    - name: negative_review_pct
      |      expr: SUM(CASE WHEN weighted_score < 0 THEN 1 ELSE 0 END) / COUNT(*)
      |      display_name: 'Negative Review Percentage'
      |      comment: 'Percentage of reviews with negative sentiment'
      |    - name: median_review_length
      |      expr: PERCENTILE(LENGTH(review_text), 0.5)
      |      display_name: 'Median Review Length'
      |""".stripMargin

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
