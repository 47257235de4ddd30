package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert updates matching keys, inserts new ones, and is idempotent") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"up_${System.nanoTime()}"))
    store.save(spark.range(10).select($"id", $"id".as("v")), "dim", "t")
    val batch = spark.range(5, 15).select($"id", ($"id" * 100).as("v"))
    store.upsert(batch, "dim", "t", Seq("id"))
    def content() = store.load("dim", "t")
      .as[(Long, Long)].collect().toMap
    val expected = (0L until 5L).map(i => i -> i).toMap ++
      (5L until 15L).map(i => i -> i * 100).toMap
    assert(content() == expected)
    // replaying the same batch changes nothing
    store.upsert(batch, "dim", "t", Seq("id"))
    assert(content() == expected)
    // no staging/old leftovers
    assert(!spark.catalog.tableExists(store.fqn("dim", "t") + "__upsert"))
    assert(!spark.catalog.tableExists(store.fqn("dim", "t") + "__old"))
  }

  test("upsert into a missing table creates it") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upnew_${System.nanoTime()}"))
    store.upsert(spark.range(3).toDF("id"), "dim", "fresh", Seq("id"))
    assert(store.load("dim", "fresh").count() == 3)
  }

  test("duplicate keys WITHIN the batch replace existing rows, all kept") {
    // upsert semantics here are whole-row replace by key set — a batch
    // carrying the same key twice contributes both rows (distinct() only
    // dedupes the anti-join key set, not the incoming rows)
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"updup_${System.nanoTime()}"))
    store.save(Seq((1L, "old")).toDF("id", "v"), "dim", "t")
    store.upsert(Seq((1L, "a"), (1L, "b")).toDF("id", "v"), "dim", "t",
      Seq("id"))
    val got = store.load("dim", "t").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (1L, "b")))
  }
}
