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

  test("crash between the renames self-heals: the full table is restored") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upheal_${System.nanoTime()}"))
    store.save(spark.range(10).select($"id", $"id".as("v")), "dim", "t")
    val fqn = store.fqn("dim", "t")
    // simulate: a prior upsert died after `name RENAME TO __old`
    spark.sql(s"ALTER TABLE $fqn RENAME TO ${fqn}__old")
    store.upsert(spark.range(5, 12).select($"id", lit(-1L).as("v")),
      "dim", "t", Seq("id"))
    // WITHOUT the heal this would have published only the 7 batch rows
    val got = store.load("dim", "t").as[(Long, Long)].collect().toMap
    assert(got == ((0L until 5L).map(i => i -> i)
      ++ (5L until 12L).map(i => i -> -1L)).toMap)
    assert(!spark.catalog.tableExists(s"${fqn}__old"))
  }

  test("leftover __old from a missed final DROP is cleared, not fatal") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"updrop_${System.nanoTime()}"))
    store.save(spark.range(5).select($"id", $"id".as("v")), "dim", "t")
    val fqn = store.fqn("dim", "t")
    spark.range(99).toDF("id").write.format("parquet")
      .saveAsTable(s"${fqn}__old") // stale pre-merge copy
    store.upsert(spark.range(3).select($"id", lit(7L).as("v")),
      "dim", "t", Seq("id"))
    assert(store.load("dim", "t").count() == 5)
    assert(!spark.catalog.tableExists(s"${fqn}__old"))
  }

  test("partitioned targets are refused, not silently flattened") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"uppart_${System.nanoTime()}"))
    store.savePartitioned(spark.range(10)
      .select($"id", ($"id" % 3).as("p")), "fact", "t", Seq("p"))
    val ex = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2).select($"id", lit(0L).as("p")),
        "fact", "t", Seq("id"))
    }
    assert(ex.getMessage.contains("layout-preserving"))
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
