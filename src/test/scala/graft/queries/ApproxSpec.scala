package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate scale-path operators stay close to their exact
  * counterparts, and the inferSchema compat mode agrees with the explicit
  * schemas.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("percentile_approx within 5% of exact percentile") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val both = docs.agg(
      percentile(col("n_chars"), lit(0.5)).as("exact"),
      percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("approx"))
      .as[(Double, Long)].head()
    assert(math.abs(both._2 - both._1) / both._1 < 0.05, both)
  }

  test("approx_count_distinct within 5% of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val both = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"))
      .as[(Long, Long)].head()
    assert(math.abs(both._2 - both._1).toDouble / both._1 < 0.05, both)
  }

  test("hll1 within-5pct booleans hold at every harness scale factor") {
    // the catalog entry's oracle is literal TRUE per scope — pin the claim
    // on all three SFs, not just the driver's sf0.01 (the HLL estimate is
    // deterministic for a dataset, so this is a fixed fact, not a flake)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = graft.SparkEntry.queries("hll1_sketch_reuse")(spark, dir)
        .as[(String, Boolean)].collect()
      assert(rows.length >= 2 && rows.forall(_._2), s"$dir: ${rows.toSeq}")
    }
  }

  test("inferSchema compat mode agrees with the explicit reviews schema") {
    val path = getClass.getResource("/landing_zone/reviews.csv").getPath
    val inferred = graft.ingest.CsvSource.readInferred(spark, path)
    val explicit = graft.ingest.CsvSource.read(spark, path,
      graft.ingest.Schemas.reviews)
    assert(inferred.columns.toSeq == explicit.columns.toSeq)
    assert(inferred.count() == explicit.count())
    // inference lands on compatible types for the key columns
    val byName = inferred.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(byName("recommendationid") == "integer" || byName("recommendationid") == "long")
    assert(byName("received_for_free") == "boolean")
    assert(byName("author_playtime_forever") == "double")
  }
}
