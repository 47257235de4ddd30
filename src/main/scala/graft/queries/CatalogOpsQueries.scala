package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Compaction, PipelineConfig, TableStore}
import graft.ingest.{CsvSource, LandingZone, Schemas}
import QueryUtil._

/** Catalog- and landing-zone-operation queries: the SURVEY.md §2 rows that
  * previously rested on specs only, surfaced as oracle-checkable DataFrames.
  *
  *  - K4  catalog comments / TBLPROPERTIES read back relationally
  *        (≙ `semantic_layer.sql:103-139`)
  *  - S2/S3 + C8  landing-zone CSV loop with filename routing and the
  *        linkage-key singularization rule (≙ `auxillary_dims.py:44-90`)
  *  - S6 + K2  catalog probe before/after a staged temp-view publish
  *        (≙ `utilities.py:34-39` + the staging views of the dim jobs)
  *  - compaction  small-file rewrite with files-reduced / rows-preserved
  *        booleans (table maintenance; `core/Compaction.scala`)
  *
  * Each emits values DuckDB reproduces literally (the ag2 scheme: the
  * checkable consequence of the operation, not its engine-internal state).
  */
object CatalogOpsQueries {

  private val factComments = Seq(
    "appid" -> "Steam application id (degenerate dim key)",
    "recommendationid" -> "unique review id (primary key)",
    "sentiment_score" -> "LLM rubric score in {-5,-2,0,1,2,5}",
    "weighted_score" -> "sentiment_score halved for sponsored reviews")

  val queries: Map[String, Q] = Map(
    // K4 — write the reference's table comment + column comments through
    // ReviewMetrics, then read them BACK through the catalog as a
    // DataFrame (DESCRIBE + SHOW TBLPROPERTIES): the round trip proves
    // the metadata actually landed in the metastore
    "k4_catalog_comments" -> ((s, d) => {
      val store = new TableStore(s, PipelineConfig(schema = "verifyk4"))
      store.drop("fact", "reviews")
      store.save(table(s, d, "orders").limit(10).select(
        col("o_orderkey").as("appid"),
        col("o_custkey").as("recommendationid"),
        lit(1).as("sentiment_score"),
        lit(0.5).as("weighted_score")), "fact", "reviews")
      graft.semantic.ReviewMetrics.applyCatalogComments(s, store)
      val fact = store.fqn("fact", "reviews")
      val colComments = s.sql(s"DESCRIBE TABLE $fact")
        .filter(col("col_name").isin(factComments.map(_._1): _*))
        .select(col("col_name").as("name"), col("comment"))
      // the 'comment' TBLPROPERTY is a reserved namespace property Spark
      // FILTERS OUT of SHOW TBLPROPERTIES; the catalog API surfaces it as
      // the table description — read it back from there
      val tblComment = s.range(1)
        .select(lit("__table__").as("name"),
          lit(s.catalog.getTable(fact).description).as("comment"))
      tblComment.unionByName(colComments)
    }),

    // S2/S3 + C8 — land six reference-dialect CSVs (plus one the router
    // must ignore), route by filename (standard / translated / linkage
    // with the plural→`<singular>_id` key rule), read each back with its
    // explicit schema and emit per-table routing + row counts
    "s3_landing_route" -> ((s, d) => {
      val tmp = s"/tmp/graft-landing-${d.replaceAll("[^a-z0-9.]", "_")}"
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(new java.io.File(tmp))
      def land(name: String, df: DataFrame): Unit =
        df.coalesce(1).write.mode("overwrite").options(CsvSource.Options)
          .csv(s"$tmp/$name.csv")
      land("developers", table(s, d, "supplier")
        .select(col("s_suppkey").as("id"), col("s_name").as("name")))
      land("publishers", table(s, d, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("id"), col("c_name").as("name")))
      land("categories", table(s, d, "region")
        .select(col("r_regionkey").as("id"), col("r_name").as("name")))
      land("genres", table(s, d, "nation")
        .select(col("n_nationkey").as("id"), col("n_name").as("name")))
      land("application_categories", table(s, d, "part")
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey").as("appid"),
          col("p_size").cast("long").as("category_id")))
      land("application_genres", table(s, d, "part")
        .filter(col("p_partkey") <= 300)
        .select(col("p_partkey").as("appid"),
          col("p_size").cast("long").as("genre_id")))
      land("junk_notes", table(s, d, "region").select(col("r_name")))
      val frames = LandingZone.route(tmp).collect {
        case LandingZone.StandardDim(p, t) =>
          CsvSource.read(s, p, Schemas.refDim)
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(t).as("tbl"), lit("standard").as("kind"),
              lit("").as("key_col"), col("n_rows"))
        case LandingZone.TranslatedDim(p, t) =>
          CsvSource.read(s, p, Schemas.refDim)
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(t).as("tbl"), lit("translated").as("kind"),
              lit("").as("key_col"), col("n_rows"))
        case LandingZone.Linkage(p, t, key) =>
          CsvSource.read(s, p, Schemas.linkage(key))
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(t).as("tbl"), lit("linkage").as("kind"),
              lit(key).as("key_col"), col("n_rows"))
      }
      frames.reduce(_.unionByName(_))
    }),

    // S6 + K2 — catalog probe (exists) before and after publishing a
    // staged temp view into a managed dim table; the emitted booleans are
    // the probe results, the count proves the staged rows landed
    "k2_probe_staging" -> ((s, d) => {
      val store = new TableStore(s, PipelineConfig(schema = "verifyk2"))
      store.drop("dim", "probe")
      val before = store.exists("dim", "probe")
      table(s, d, "region").createOrReplaceTempView("stg_region_k2")
      store.save(s.table("stg_region_k2"), "dim", "probe")
      val after = store.exists("dim", "probe")
      store.load("dim", "probe")
        .agg(count(lit(1)).as("dim_rows"))
        .select(lit(before).as("probe_before"), lit(after).as("probe_after"),
          col("dim_rows"))
    }),

    // compaction — fragment a managed table into 16 files, compact to one,
    // emit (files_reduced, files_after, preserved row count); the count is
    // read from the compacted table so the oracle checks data survival
    "cp1_compaction" -> ((s, d) => {
      val store = new TableStore(s, PipelineConfig(schema = "verifycp"))
      store.drop("fact", "frag")
      store.save(table(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice")).repartition(16),
        "fact", "frag")
      val (before, after) = Compaction.compactTable(
        s, store.fqn("fact", "frag"), targetRows = 100000000L)
      store.load("fact", "frag")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(before > after).as("files_reduced"),
          lit(after).as("files_after"), col("n_rows"))
    })
  )

  val oracle: Map[String, String] = Map(
    "k4_catalog_comments" ->
      ("""SELECT * FROM (VALUES
        | ('__table__', 'Steam review facts with LLM sentiment scores, one row per review'),
        |""".stripMargin +
        factComments.map { case (c, cm) => s" ('$c', '$cm')" }
          .mkString(",\n") +
        ") AS t(name, comment)"),
    "s3_landing_route" ->
      """SELECT * FROM (
        | SELECT 'application_categories' AS tbl, 'linkage' AS kind, 'category_id' AS key_col,
        |   (SELECT CAST(count(*) AS BIGINT) FROM part WHERE p_partkey <= 500) AS n_rows
        | UNION ALL SELECT 'application_genres', 'linkage', 'genre_id',
        |   (SELECT CAST(count(*) AS BIGINT) FROM part WHERE p_partkey <= 300)
        | UNION ALL SELECT 'categories', 'translated', '',
        |   (SELECT CAST(count(*) AS BIGINT) FROM region)
        | UNION ALL SELECT 'developers', 'standard', '',
        |   (SELECT CAST(count(*) AS BIGINT) FROM supplier)
        | UNION ALL SELECT 'genres', 'translated', '',
        |   (SELECT CAST(count(*) AS BIGINT) FROM nation)
        | UNION ALL SELECT 'publishers', 'standard', '',
        |   (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE c_custkey <= 200)
        |) t""".stripMargin,
    "k2_probe_staging" ->
      """SELECT FALSE AS probe_before, TRUE AS probe_after,
        | (SELECT CAST(count(*) AS BIGINT) FROM region) AS dim_rows""".stripMargin,
    "cp1_compaction" ->
      """SELECT TRUE AS files_reduced, CAST(1 AS INTEGER) AS files_after,
        | (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows""".stripMargin
  )
}
