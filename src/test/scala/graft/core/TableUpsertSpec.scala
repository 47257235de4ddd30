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

  test("leftover __old from a missed final DROP is cleared when superseded") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"updrop_${System.nanoTime()}"))
    store.save(spark.range(5).select($"id", $"id".as("v")), "dim", "t")
    val fqn = store.fqn("dim", "t")
    // plausible pre-merge copy: its keys are a subset of the published
    // table's (the merge keeps every pre-merge key) — safe to clear
    spark.range(3).select($"id", lit(0L).as("v")).write.format("parquet")
      .saveAsTable(s"${fqn}__old")
    store.upsert(spark.range(3).select($"id", lit(7L).as("v")),
      "dim", "t", Seq("id"))
    assert(store.load("dim", "t").count() == 5)
    assert(!spark.catalog.tableExists(s"${fqn}__old"))
  }

  test("self-heal refuses to drop an __old the published table does not cover") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upbad_${System.nanoTime()}"))
    store.save(spark.range(5).select($"id", $"id".as("v")), "dim", "t")
    val fqn = store.fqn("dim", "t")
    // a quiesce-violating writer re-created the target after a crash: __old
    // holds keys 0..9, the published table only 0..4 — __old is the only
    // complete copy and must NOT be silently dropped
    spark.range(10).select($"id", lit(0L).as("v")).write.format("parquet")
      .saveAsTable(s"${fqn}__old")
    val ex = intercept[IllegalStateException] {
      store.upsert(spark.range(2).select($"id", lit(7L).as("v")),
        "dim", "t", Seq("id"))
    }
    assert(ex.getMessage.contains("reconcile"))
    assert(spark.catalog.tableExists(fqn) &&
      spark.catalog.tableExists(s"${fqn}__old"))
  }

  test("null incoming keys are refused loudly (replay would duplicate)") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upnull_${System.nanoTime()}"))
    store.save(Seq((1L, "a")).toDF("id", "v"), "dim", "t")
    val batch = Seq((Option(2L), "b"), (Option.empty[Long], "c"))
      .toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      store.upsert(batch, "dim", "t", Seq("id"))
    }
    assert(ex.getMessage.contains("non-null"))
  }

  test("a write racing the plain-table swap aborts and restores the original") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"uprace_${System.nanoTime()}"))
    store.save(spark.range(10).select($"id", $"id".as("v")), "dim", "t")
    val fqn = store.fqn("dim", "t")
    val ex = intercept[IllegalStateException] {
      store.upsert(spark.range(10, 12).select($"id", lit(-1L).as("v")),
        "dim", "t", Seq("id"),
        beforeSwap = () => spark.range(100, 101)
          .select($"id", lit(0L).as("v"))
          .write.format("parquet").mode("append").saveAsTable(fqn))
    }
    assert(ex.getMessage.contains("quiesce"))
    // original (including the racing row) is still published; no leftovers
    assert(store.load("dim", "t").count() == 11)
    assert(!spark.catalog.tableExists(s"${fqn}__upsert"))
    assert(!spark.catalog.tableExists(s"${fqn}__old"))
  }

  test("oversized unpartitioned targets are refused with the partitioned fix") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upbig_${System.nanoTime()}"))
    store.save(spark.range(1000).select($"id", $"id".as("v")), "dim", "t")
    // any real table exceeds a 1-byte ceiling — the guard must fire before
    // the O(table) merge is staged
    val ex = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2).select($"id", lit(0L).as("v")),
        "dim", "t", Seq("id"), maxFullRewriteBytes = 1L)
    }
    assert(ex.getMessage.contains("savePartitioned"))
    // content untouched; the explicit opt-out accepts the full rewrite
    assert(store.load("dim", "t").count() == 1000)
    store.upsert(spark.range(2).select($"id", lit(-1L).as("v")),
      "dim", "t", Seq("id"), maxFullRewriteBytes = Long.MaxValue)
    assert(store.load("dim", "t").filter($"v" === -1L).count() == 2)
  }

  test("a batch carrying columns the target lacks is refused, not " +
      "silently projected away (plain AND partitioned paths)") {
    // found by the round-18 fuzzer extension: both merge paths project
    // the incoming batch onto the target's columns, so a widened
    // writer's new column would vanish without a sound
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upextra_${System.nanoTime()}"))
    store.save(spark.range(3).select($"id", lit(1L).as("v")), "dim", "t")
    val e1 = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2)
        .select($"id", lit(2L).as("v"), lit(9L).as("w")),
        "dim", "t", Seq("id"))
    }
    assert(e1.getMessage.contains("silently"), e1.getMessage)
    assert(store.load("dim", "t").count() == 3) // untouched by the refusal
    store.savePartitioned(spark.range(3)
      .select($"id", lit(1L).as("v"), ($"id" % 2).as("p")),
      "dim", "tp", Seq("p"))
    val e2 = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2)
        .select($"id", lit(2L).as("v"), ($"id" % 2).as("p"),
          lit(9L).as("w")),
        "dim", "tp", Seq("id"))
    }
    assert(e2.getMessage.contains("silently"), e2.getMessage)
    assert(store.load("dim", "tp").count() == 3)
  }

  test("bucketed targets are refused, not silently flattened") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upbkt_${System.nanoTime()}"))
    store.saveBucketed(spark.range(10)
      .select($"id", ($"id" % 3).as("b")), "fact", "t", 4, Seq("id"))
    val ex = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2).select($"id", lit(0L).as("b")),
        "fact", "t", Seq("id"))
    }
    assert(ex.getMessage.contains("layout-preserving"))
  }

  private def fileDigests(fqn: String, part: String): Map[String, Seq[Byte]] =
    spark.table(fqn).inputFiles.filter(_.contains(part)).map { u =>
      val p = java.nio.file.Paths.get(new java.net.URI(u).getPath)
      u -> java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(p)).toSeq
    }.toMap

  test("partitioned upsert rewrites ONLY touched partitions — others byte-identical") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"uppart_${System.nanoTime()}"))
    store.savePartitioned(spark.range(30)
      .select($"id", ($"id" * 10).as("v"), ($"id" % 3).as("p")),
      "fact", "t", Seq("p"))
    val fqn = store.fqn("fact", "t")
    val before1 = fileDigests(fqn, "p=1")
    val before2 = fileDigests(fqn, "p=2")
    assert(before1.nonEmpty && before2.nonEmpty)
    // update two keys in p=0, insert one key into a brand-new partition
    val batch = Seq((0L, -1L, 0L), (3L, -1L, 0L), (100L, -1L, 9L))
      .toDF("id", "v", "p")
    store.upsert(batch, "fact", "t", Seq("id"))
    val got = store.load("fact", "t").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = (0L until 30L)
      .map(i => i -> ((i * 10, i % 3))).toMap ++
      Map(0L -> ((-1L, 0L)), 3L -> ((-1L, 0L)), 100L -> ((-1L, 9L)))
    assert(got == expected)
    // untouched partitions: same files, byte-identical content
    assert(fileDigests(fqn, "p=1") == before1)
    assert(fileDigests(fqn, "p=2") == before2)
    // replay is idempotent
    store.upsert(batch, "fact", "t", Seq("id"))
    assert(store.load("fact", "t").count() == 31)
    assert(fileDigests(fqn, "p=1") == before1)
  }

  test("a key moving partitions leaves no stale row; emptied partitions drop") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upmove_${System.nanoTime()}"))
    store.savePartitioned(
      Seq((1L, "x", 0L), (2L, "y", 1L)).toDF("id", "v", "p"),
      "fact", "t", Seq("p"))
    val fqn = store.fqn("fact", "t")
    // key 2 moves p=1 → p=0; p=1 ends empty and must not keep a stale row
    store.upsert(Seq((2L, "z", 0L)).toDF("id", "v", "p"),
      "fact", "t", Seq("id"))
    val got = store.load("fact", "t").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "x", 0L), (2L, "z", 0L)))
    assert(!spark.table(fqn).inputFiles.exists(_.contains("p=1")))
    assert(spark.sql(s"SHOW PARTITIONS $fqn").collect()
      .map(_.getString(0)).forall(!_.contains("p=1")))
  }

  test("addColumns widens in place: metadata-only ALTER, old rows read " +
      "null, files untouched") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"addcol_${System.nanoTime()}"))
    store.save(spark.range(3).select($"id", ($"id" * 10).as("v")), "dim", "t")
    val fqn = store.fqn("dim", "t")
    val filesBefore = spark.table(fqn).inputFiles.toSet
    store.addColumns("dim", "t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType))))
    // zero data movement: the exact same files back the evolved table
    assert(spark.table(fqn).inputFiles.toSet == filesBefore)
    val got = store.load("dim", "t").select("id", "v", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2)))
    assert(got.toSet == Set((0L, 0L, true), (1L, 10L, true), (2L, 20L, true)))
    // a later full-schema upsert lands values in the new column
    store.upsert(Seq((1L, 10L, 7L), (5L, 50L, 8L)).toDF("id", "v", "w"),
      "dim", "t", Seq("id"))
    val after = store.load("dim", "t").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(after == Map(0L -> -1L, 1L -> 7L, 2L -> -1L, 5L -> 8L))
  }

  test("addColumns forces nullable=true: a non-nullable input field must " +
      "not render NOT NULL into the catalog for a column every old row " +
      "reads as NULL (r19 verdict)") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"addnn_${System.nanoTime()}"))
    store.save(spark.range(3).select($"id", $"id".as("v")), "dim", "t")
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    store.addColumns("dim", "t",
      StructType(Seq(StructField("w", LongType, nullable = false))))
    val field = spark.table(store.fqn("dim", "t")).schema("w")
    assert(field.nullable,
      "evolved column must be nullable in the catalog regardless of the " +
        "input field's flag — parquet never enforces NOT NULL and every " +
        "pre-evolution row reads NULL")
    // and the NULLs are actually readable through the evolved schema
    assert(store.load("dim", "t").where($"w".isNull).count() == 3)
  }

  test("addColumns refusals are loud: empty set, backticks, duplicates") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"addbad_${System.nanoTime()}"))
    store.save(spark.range(2).select($"id", $"id".as("v")), "dim", "t")
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    intercept[IllegalArgumentException] {
      store.addColumns("dim", "t", StructType(Nil))
    }
    intercept[IllegalArgumentException] {
      store.addColumns("dim", "t",
        StructType(Seq(StructField("a`b", LongType))))
    }
    // duplicate of an existing column (any case, under the default
    // resolver): Spark's own ALTER refuses, table unchanged
    intercept[org.apache.spark.sql.AnalysisException] {
      store.addColumns("dim", "t", StructType(Seq(StructField("V", LongType))))
    }
    assert(store.load("dim", "t").columns.toSeq == Seq("id", "v"))
  }

  test("upsert evolveSchema=true widens the target instead of refusing " +
      "(plain AND partitioned), and the evolution is metadata-only") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upev_${System.nanoTime()}"))
    // plain
    store.save(spark.range(3).select($"id", lit(1L).as("v")), "dim", "t")
    store.upsert(spark.range(2, 4)
      .select($"id", lit(2L).as("v"), ($"id" + 100L).as("w")),
      "dim", "t", Seq("id"), evolveSchema = true)
    val got = store.load("dim", "t").collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((0L, 1L, -1L), (1L, 1L, -1L),
      (2L, 2L, 102L), (3L, 2L, 103L)))
    // partitioned: untouched partitions' files stay byte-identical
    // through the evolution (ADD COLUMNS moves no data; the merge
    // rewrites only touched partitions)
    store.savePartitioned(spark.range(4)
      .select($"id", lit(1L).as("v"), ($"id" % 2).as("p")),
      "fact", "tp", Seq("p"))
    val fqn = store.fqn("fact", "tp")
    val before1 = fileDigests(fqn, "p=1")
    assert(before1.nonEmpty)
    store.upsert(Seq((0L, 5L, 0L, 42L)).toDF("id", "v", "p", "w"),
      "fact", "tp", Seq("id"), evolveSchema = true)
    assert(fileDigests(fqn, "p=1") == before1)
    // select by NAME: a partitioned table keeps its partition columns
    // LAST, so the evolved schema is (id, v, w, p), not (id, v, p, w)
    val gotP = store.load("fact", "tp").select("id", "v", "w")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(gotP == Set((0L, 5L, 42L), (1L, 1L, -1L),
      (2L, 1L, -1L), (3L, 1L, -1L)))
    // default posture unchanged: without the flag the next widening
    // still refuses loudly
    intercept[IllegalArgumentException] {
      store.upsert(Seq((0L, 5L, 0L, 42L, 1L)).toDF("id", "v", "p", "w", "z"),
        "fact", "tp", Seq("id"))
    }
  }

  test("a batch column differing only in CASE is not 'extra' under the " +
      "default resolver — it merges, never refuses (ADVICE r18)") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"upcase_${System.nanoTime()}"))
    store.save(spark.range(3).select($"id", lit(1L).as("v")), "dim", "t")
    // batch carries V (upper): the merge projection resolves it onto v
    // case-insensitively, so the guard must not refuse it as extra
    store.upsert(spark.range(1, 2).select($"id", lit(9L).as("V")),
      "dim", "t", Seq("id"))
    val got = store.load("dim", "t").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 9L, 2L -> 1L))
    assert(store.load("dim", "t").columns.toSeq == Seq("id", "v"))
  }

  test("addColumns works on bucketed layouts too (specs name existing " +
      "columns; upsert still refuses the bucketed merge)") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"addbkt_${System.nanoTime()}"))
    store.saveBucketed(spark.range(10)
      .select($"id", ($"id" % 3).as("b")), "fact", "t", 4, Seq("id"))
    store.addColumns("fact", "t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType))))
    val df = store.load("fact", "t")
    assert(df.columns.toSeq == Seq("id", "b", "w"))
    assert(df.where($"w".isNull).count() == 10)
    // the merge path still refuses bucketed targets — evolveSchema must
    // not become a side door (bucket guard fires before the evolve)
    val ex = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2)
        .select($"id", lit(0L).as("b"), lit(1L).as("w"), lit(2L).as("z")),
        "fact", "t", Seq("id"), evolveSchema = true)
    }
    assert(ex.getMessage.contains("layout-preserving"))
    // and the refused evolve left no z column behind
    assert(store.load("fact", "t").columns.toSeq == Seq("id", "b", "w"))
  }

  test("type drift, safe direction: an int batch upserting into a long " +
      "target lands CAST to the target type — the table is never " +
      "retyped (plain AND partitioned; r20 verdict item 1)") {
    import org.apache.spark.sql.types.LongType
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"updrift_${System.nanoTime()}"))
    // plain: (long, long) target; batch arrives fully int-typed (the
    // reference's per-file inferSchema shape) including the KEY column
    store.save(spark.range(3).select($"id", ($"id" * 10).as("v")),
      "dim", "t")
    store.upsert(Seq((1, -1), (5, -5)).toDF("id", "v"), "dim", "t",
      Seq("id"))
    val sch = store.load("dim", "t").schema
    assert(sch("id").dataType == LongType && sch("v").dataType == LongType,
      s"pre-fix the plain merge PUBLISHED the union-coerced type: $sch")
    assert(store.load("dim", "t").as[(Long, Long)].collect().toMap ==
      Map(0L -> 0L, 1L -> -1L, 2L -> 20L, 5L -> -5L))
    // partitioned: drift in value AND partition columns
    store.savePartitioned(spark.range(4)
      .select($"id", ($"id" * 10).as("v"), ($"id" % 2).as("p")),
      "fact", "tp", Seq("p"))
    store.upsert(Seq((1, -1, 0), (9, -9, 1)).toDF("id", "v", "p"),
      "fact", "tp", Seq("id"))
    val schP = store.load("fact", "tp").schema
    assert(Seq("id", "v", "p").forall(schP(_).dataType == LongType))
    assert(store.load("fact", "tp").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap ==
      Map(0L -> ((0L, 0L)), 1L -> ((-1L, 0L)), 2L -> ((20L, 0L)),
        3L -> ((30L, 1L)), 9L -> ((-9L, 1L))))
  }

  test("type drift, unsafe direction: narrowing/string mismatches are " +
      "refused loudly naming column and both types, on both paths; " +
      "tables untouched") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"updriftb_${System.nanoTime()}"))
    // int target, long batch: pre-fix the plain path silently retyped
    // the whole table to bigint via the staged rewrite
    store.save(Seq((1, 10), (2, 20)).toDF("id", "v"), "dim", "t")
    val e1 = intercept[IllegalArgumentException] {
      store.upsert(spark.range(2).select($"id", ($"id" + 100L).as("v")),
        "dim", "t", Seq("id"))
    }
    assert(e1.getMessage.contains("safe upcast") &&
      e1.getMessage.contains("v: batch bigint vs target int"),
      e1.getMessage)
    assert(store.load("dim", "t").schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(store.load("dim", "t").count() == 2)
    // string batch into a numeric column
    val e2 = intercept[IllegalArgumentException] {
      store.upsert(Seq((1, "ten")).toDF("id", "v"), "dim", "t", Seq("id"))
    }
    assert(e2.getMessage.contains("v: batch string vs target int"),
      e2.getMessage)
    // partitioned path: pre-fix insertInto store-assignment silently
    // NARROWED the batch (loud only on overflow under ANSI)
    store.savePartitioned(Seq((1, 10, 0), (2, 20, 1)).toDF("id", "v", "p"),
      "fact", "tp", Seq("p"))
    val e3 = intercept[IllegalArgumentException] {
      store.upsert(Seq((1L, 5000000000L, 0L)).toDF("id", "v", "p"),
        "fact", "tp", Seq("id"))
    }
    assert(e3.getMessage.contains("safe upcast"), e3.getMessage)
    assert(store.load("fact", "tp").count() == 2)
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
