package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Raw-zone CSV reader.
  *
  * Reproduces the reference's exact option set (S1-S3:
  * `/root/reference/src/notebooks/modelling/reviews_fact.py:117-125`,
  * `auxillary_dims.py:50-58,106-114`): header, `sep=","`, multiline quoted
  * fields, `escape='"'`, UTF-8.
  *
  * The reference relies on `inferSchema=True` everywhere; we declare
  * explicit `StructType`s (FIXTURES.md) — deterministic and one scan
  * instead of two — keeping an `inferCompat` mode for fidelity testing
  * (SURVEY.md §7.4.6).
  */
object CsvSource {

  val Options: Map[String, String] = Map(
    "header" -> "true",
    "sep" -> ",",
    "multiLine" -> "true",
    "escape" -> "\"",
    "encoding" -> "UTF-8")

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(Options).schema(schema).csv(path)

  /** inferSchema compat mode ≙ the reference's reader verbatim. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.options(Options).option("inferSchema", "true").csv(path)
}

/** Raw-zone catalog surface ≙ the reference's queryable raw tables
  * `steam.raw.inbound_*` (`/root/reference/exploration/analysis.sql:20-21,
  * 25,36,55-59,68`): every landing-zone CSV (file or directory of parts)
  * becomes a `raw_<stem>` temp view, so an analyst's ad-hoc SQL runs
  * directly against the raw layer. Registration is lazy — it scans nothing;
  * SQL over a view reads the CSV with the reference dialect, with an
  * explicit schema where provided (one scan) and inference otherwise
  * (reference-verbatim, two scans).
  */
object RawCatalog {

  def register(spark: SparkSession, dir: String,
               schemas: Map[String, StructType] = Map.empty): Seq[String] = {
    val entries = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".csv") || f.isDirectory)
      .sortBy(_.getName)
    // Same identifier rule as TableStore.ident, and fail fast on collisions
    // (`x.csv` next to a directory `x` would otherwise silently last-win).
    val stems = entries.map(_.getName.stripSuffix(".csv"))
    stems.foreach(s => require(s.matches("[A-Za-z0-9_]+"),
      s"raw landing name '$s' is not a valid view identifier ([A-Za-z0-9_]+)"))
    val dup = stems.groupBy(identity).collect { case (s, g) if g.length > 1 => s }
    require(dup.isEmpty, s"raw landing name collision: ${dup.mkString(", ")}")
    entries.toSeq.map { f =>
      val stem = f.getName.stripSuffix(".csv")
      val df = schemas.get(stem) match {
        case Some(sc) => CsvSource.read(spark, f.getAbsolutePath, sc)
        case None     => CsvSource.readInferred(spark, f.getAbsolutePath)
      }
      val view = s"raw_$stem"
      df.createOrReplaceTempView(view)
      view
    }
  }
}

/** Explicit schemas for every raw-zone file (FIXTURES.md §1). */
object Schemas {

  /** `reviews.csv` — `reviews_fact.py:117-146`. */
  val reviews: StructType = StructType(Seq(
    StructField("recommendationid", LongType),
    StructField("appid", LongType),
    StructField("language", StringType),
    StructField("review_text", StringType),
    StructField("timestamp_updated", TimestampType),
    StructField("received_for_free", BooleanType),
    StructField("comment_count", IntegerType),
    StructField("author_playtime_forever", DoubleType),
    StructField("author_playtime_at_review", DoubleType),
    StructField("written_during_early_access", BooleanType)))

  /** `applications.csv` — `auxillary_dims.py:106-148`. */
  val applications: StructType = StructType(Seq(
    StructField("appid", LongType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("release_date", DateType),
    StructField("is_free", BooleanType),
    StructField("mat_initial_price", DoubleType),
    StructField("mat_final_price", DoubleType),
    StructField("mat_currency", StringType),
    StructField("mat_supports_windows", BooleanType),
    StructField("mat_supports_mac", BooleanType),
    StructField("mat_supports_linux", BooleanType),
    StructField("metacritic_score", IntegerType),
    StructField("updated_at", TimestampType)))

  /** Reference dims `developers/publishers/categories/genres.csv`. */
  val refDim: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  /** Linkage `application_<x>.csv` with per-file key column
    * (`auxillary_dims.py:73-90`).
    */
  def linkage(key: String): StructType = StructType(Seq(
    StructField("appid", LongType),
    StructField(key, LongType)))
}

/** Landing-zone file router ≙ the driver-side loop of
  * `auxillary_dims.py:44-69`: filename → {standard dim, AI-translated dim,
  * linkage, applications, reviews} routing.
  */
object LandingZone {

  sealed trait RawFile { def path: String; def table: String }
  final case class StandardDim(path: String, table: String) extends RawFile
  final case class TranslatedDim(path: String, table: String) extends RawFile
  final case class Linkage(path: String, table: String, key: String) extends RawFile
  final case class Applications(path: String) extends RawFile { val table = "applications" }
  final case class Reviews(path: String) extends RawFile { val table = "reviews" }

  /** ≙ `auxillary_dims.py:44-46` routing sets. */
  private val standard = Set("developers", "publishers")
  private val translated = Set("categories", "genres")

  def route(dir: String): Seq[RawFile] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val stem = f.getName.stripSuffix(".csv")
      val p = f.getAbsolutePath
      stem match {
        case "applications" => Some(Applications(p))
        case "reviews" => Some(Reviews(p))
        case s if standard.contains(s) => Some(StandardDim(p, s))
        case s if translated.contains(s) => Some(TranslatedDim(p, s))
        case s if s.startsWith("application_") =>
          // application_genres → genre_id, application_categories →
          // category_id (`auxillary_dims.py:73-90`)
          val entity = s.stripPrefix("application_")
          val singular =
            if (entity.endsWith("ies")) entity.dropRight(3) + "y"
            else entity.stripSuffix("s")
          Some(Linkage(p, s, singular + "_id"))
        case _ => None
      }
    }
  }
}
