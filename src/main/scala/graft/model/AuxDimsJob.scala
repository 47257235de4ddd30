package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GameConstants, PipelineConfig, TableStore}
import graft.ai.LlmClient
import graft.ingest.{CsvSource, LandingZone, Schemas}

/** Auxiliary-dimension ETL ≙ `/root/reference/src/notebooks/modelling/
  * auxillary_dims.py`.
  *
  * Stages every landing-zone dim/linkage CSV as a temp view
  * (`auxillary_dims.py:48-69`), translating `categories`/`genres` names to
  * English via the AI function (`auxillary_dims.py:14-27,64-67`), then
  * flattens each linkage × reference pair with a left join to appid-grain
  * `dim_*` tables (`auxillary_dims.py:73-97` — J1).
  *
  * Scale: reference dims are tiny → the flatten join broadcasts; the only
  * shuffle-bearing frame is the linkage scan itself.
  */
final class AuxDimsJob(spark: SparkSession, store: TableStore,
                       config: PipelineConfig, translator: LlmClient) {

  private val translateUdf = {
    val t = translator
    // prompt shape ≙ CONCAT('Task: Translate…', name) — `auxillary_dims.py:19-25`
    udf((name: String) =>
      if (name == null) null else t.query("offline-dict", name))
  }

  /** Linkage-table config ≙ `auxillary_dims.py:73-90`. */
  private val linkageRefs = Map(
    "application_categories" -> ("categories", "category_id"),
    "application_genres" -> ("genres", "genre_id"),
    "application_developers" -> ("developers", "developer_id"),
    "application_publishers" -> ("publishers", "publisher_id"))

  def run(): Unit = {
    val files = LandingZone.route(config.rawLocation)

    // stage reference dims + linkages as temp views (`auxillary_dims.py:48-69`)
    files.foreach {
      case LandingZone.StandardDim(path, table) =>
        CsvSource.read(spark, path, Schemas.refDim)
          .createOrReplaceTempView(s"stage_$table")
      case LandingZone.TranslatedDim(path, table) =>
        CsvSource.read(spark, path, Schemas.refDim)
          .withColumn("name", translateUdf(col("name")))
          .createOrReplaceTempView(s"stage_$table")
      case LandingZone.Linkage(path, table, key) =>
        CsvSource.read(spark, path, Schemas.linkage(key))
          .createOrReplaceTempView(s"linkage_$table")
      case _ => () // applications/reviews handled by their own jobs
    }

    // flatten: linkage LEFT JOIN reference on key = id → dim_* tables
    // (`auxillary_dims.py:92-97`); dims are small → broadcast
    linkageRefs.foreach { case (linkTable, (refTable, key)) =>
      if (spark.catalog.tableExists(s"linkage_$linkTable")) {
        val link = spark.table(s"linkage_$linkTable")
        val ref = broadcast(spark.table(s"stage_$refTable"))
        val dim = link.join(ref, link(key) === ref(GameConstants.DimId), "left")
        store.save(dim, "dim", refTable)
      }
    }
  }
}
