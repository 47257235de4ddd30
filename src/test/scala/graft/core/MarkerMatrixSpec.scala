package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mutation-layer marker STATE MACHINE, asserted as a matrix
  * (ARCHITECTURE.md round-20): five sidecar objects coexist across the
  * layer (`__upsert`, `__old`, `__compact`, `__publish`, the writer
  * lease) and the r17–r19 defects were all illegal COMPOSITIONS of
  * individually-correct transitions. This spec constructs each
  * representable sidecar state and asserts every mutator's documented
  * behavior — proceed / heal / refuse-with-message — so an
  * undocumented combination can only enter the code base by failing a
  * cell here first. The per-transition specs (TableUpsertSpec,
  * CompactionSpec, WriterLeaseSpec) own the deep per-edge contracts;
  * this one owns the table.
  *
  * Row numbering follows the ARCHITECTURE.md matrix. The lease file is
  * orthogonal to every row (advisory; stale ⇒ stolen by exactly one
  * contender) and is pinned in WriterLeaseSpec.
  */
class MarkerMatrixSpec extends SparkSpec {
  import spark.implicits._

  /** Fresh PLAIN table {0→0, 1→10, 2→20}. */
  private def plainStore(): (TableStore, String) = {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"mx_${System.nanoTime()}"))
    store.save(spark.range(3).select($"id", ($"id" * 10).as("v")),
      "dim", "t")
    (store, store.fqn("dim", "t"))
  }

  /** Fresh PARTITIONED table ids 0..5, p = id % 2. */
  private def partedStore(): (TableStore, String) = {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"mxp_${System.nanoTime()}"))
    store.savePartitioned(spark.range(6)
      .select($"id", ($"id" * 10).as("v"), ($"id" % 2).as("p")),
      "fact", "t", Seq("p"))
    (store, store.fqn("fact", "t"))
  }

  test("row 2 — {__upsert}: dead staging work; every mutator proceeds, " +
      "the next upsert discards it") {
    val (store, fqn) = plainStore()
    def plantStale(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS ${fqn}__upsert")
      Seq((999L, 999L)).toDF("id", "v").write.format("parquet")
        .saveAsTable(s"${fqn}__upsert")
    }
    plantStale()
    Compaction.compactTable(spark, fqn, 1000L) // proceeds
    assert(spark.catalog.tableExists(s"${fqn}__upsert"))
    store.save(Seq((7L, 7L)).toDF("id", "v"), "dim", "t",
      org.apache.spark.sql.SaveMode.Append) // proceeds
    store.upsert(Seq((1L, -1L)).toDF("id", "v"), "dim", "t", Seq("id"))
    assert(!spark.catalog.tableExists(s"${fqn}__upsert"),
      "upsert must discard the stale stage")
    assert(store.load("dim", "t").as[(Long, Long)].collect().toMap ==
      Map(0L -> 0L, 1L -> -1L, 2L -> 20L, 7L -> 7L),
      "the stale stage's junk row must never surface")
  }

  test("row 3 — {__old}, T absent: upsert and compactTable both heal by " +
      "renaming back; overwrite/append saves re-create T (leaving row 5 " +
      "for the next heal — documented composition)") {
    // upsert heal
    locally {
      val (store, fqn) = plainStore()
      spark.sql(s"ALTER TABLE $fqn RENAME TO ${fqn}__old")
      store.upsert(Seq((1L, -1L)).toDF("id", "v"), "dim", "t", Seq("id"))
      assert(store.load("dim", "t").as[(Long, Long)].collect().toMap ==
        Map(0L -> 0L, 1L -> -1L, 2L -> 20L))
      assert(!spark.catalog.tableExists(s"${fqn}__old"))
    }
    // compactTable heal
    locally {
      val (_, fqn) = plainStore()
      spark.sql(s"ALTER TABLE $fqn RENAME TO ${fqn}__old")
      Compaction.compactTable(spark, fqn, 1000L)
      assert(spark.table(fqn).count() == 3)
      assert(!spark.catalog.tableExists(s"${fqn}__old"))
    }
    // overwrite save proceeds (supersede); __old remains — the NEXT
    // upsert sees row 5 (new content covers nothing) and refuses loudly
    locally {
      val (store, fqn) = plainStore()
      spark.sql(s"ALTER TABLE $fqn RENAME TO ${fqn}__old")
      store.save(Seq((100L, 1L)).toDF("id", "v"), "dim", "t")
      assert(store.load("dim", "t").count() == 1)
      assert(spark.catalog.tableExists(s"${fqn}__old"))
      val e = intercept[IllegalStateException] {
        store.upsert(Seq((100L, 2L)).toDF("id", "v"), "dim", "t", Seq("id"))
      }
      assert(e.getMessage.contains("reconcile"), e.getMessage)
    }
  }

  test("row 4 — {__old}, T present and provably covered: upsert (key " +
      "coverage) and compactTable (content equality) both drop it and " +
      "proceed") {
    locally {
      val (store, fqn) = plainStore()
      spark.table(fqn).limit(2).write.format("parquet")
        .saveAsTable(s"${fqn}__old") // key-subset copy
      store.upsert(Seq((1L, -1L)).toDF("id", "v"), "dim", "t", Seq("id"))
      assert(!spark.catalog.tableExists(s"${fqn}__old"))
      assert(store.load("dim", "t").count() == 3)
    }
    locally {
      val (_, fqn) = plainStore()
      spark.table(fqn).write.format("parquet")
        .saveAsTable(s"${fqn}__old") // exact copy
      Compaction.compactTable(spark, fqn, 1000L)
      assert(!spark.catalog.tableExists(s"${fqn}__old"))
      assert(spark.table(fqn).count() == 3)
    }
  }

  test("row 5 — {__old} diverged from T: upsert and compactTable refuse " +
      "loudly, nothing dropped; plain saves (which replace/compose by " +
      "contract) still proceed") {
    val (store, fqn) = plainStore()
    def plantDiverged(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS ${fqn}__old")
      spark.range(10).select($"id", lit(0L).as("v")).write
        .format("parquet").saveAsTable(s"${fqn}__old")
    }
    plantDiverged()
    val e1 = intercept[IllegalStateException] {
      store.upsert(Seq((1L, -1L)).toDF("id", "v"), "dim", "t", Seq("id"))
    }
    assert(e1.getMessage.contains("reconcile"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Compaction.compactTable(spark, fqn, 1000L)
    }
    assert(e2.getMessage.contains("reconcile"), e2.getMessage)
    assert(spark.catalog.tableExists(s"${fqn}__old") &&
      spark.table(fqn).count() == 3, "refusals must not mutate")
    store.save(Seq((7L, 7L)).toDF("id", "v"), "dim", "t",
      org.apache.spark.sql.SaveMode.Append)
    assert(store.load("dim", "t").count() == 4)
  }

  test("row 6 — {__compact}, no marker (pre-publish crash): live table " +
      "authoritative; upsert/saves proceed, the compaction resume " +
      "DISCARDS the stage (r19 defect pin)") {
    val (store, fqn) = partedStore()
    spark.table(fqn).write.format("parquet").partitionBy("p")
      .saveAsTable(s"${fqn}__compact")
    // live never in doubt: upsert lands
    store.upsert(Seq((0L, -1L, 1L)).toDF("id", "v", "p"), "fact", "t",
      Seq("id")) // key 0 MOVES p=0 → p=1
    // append composes fine
    store.savePartitioned(Seq((50L, 1L, 0L)).toDF("id", "v", "p"),
      "fact", "t", Seq("p"), org.apache.spark.sql.SaveMode.Append)
    // resume discards the stale stage instead of reverting the moves
    Compaction.compactPartitions(spark, fqn, "p >= 0", 1000L)
    val got = store.load("fact", "t").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((-1L, 1L)), "stale stage must not revert the move")
    assert(got(50L) == ((1L, 0L)) && got.size == 7)
    assert(!spark.catalog.tableExists(s"${fqn}__compact"))
  }

  test("row 7 — {__compact, __publish} (mid-publish crash): every " +
      "mutator refuses with the pending message; the resume re-publishes " +
      "the stage; a full overwrite supersedes and clears both") {
    def plant(): (TableStore, String) = {
      val (store, fqn) = partedStore()
      spark.table(fqn).write.format("parquet").partitionBy("p")
        .saveAsTable(s"${fqn}__compact")
      spark.sql(s"CREATE TABLE ${fqn}__publish (pending INT) USING parquet")
      (store, fqn)
    }
    locally { // refusals: upsert, compactTable, append save
      val (store, fqn) = plant()
      val e1 = intercept[IllegalStateException] {
        store.upsert(Seq((9L, 9L, 1L)).toDF("id", "v", "p"), "fact", "t",
          Seq("id"))
      }
      assert(e1.getMessage.contains("pending"), e1.getMessage)
      val e2 = intercept[IllegalStateException] {
        Compaction.compactTable(spark, fqn, 1000L)
      }
      assert(e2.getMessage.contains("pending"), e2.getMessage)
      val e3 = intercept[IllegalStateException] {
        store.savePartitioned(Seq((9L, 9L, 1L)).toDF("id", "v", "p"),
          "fact", "t", Seq("p"), org.apache.spark.sql.SaveMode.Append)
      }
      assert(e3.getMessage.contains("pending"), e3.getMessage)
      // heal: resume re-publishes and clears
      Compaction.compactPartitions(spark, fqn, "p >= 0", 1000L)
      assert(!spark.catalog.tableExists(s"${fqn}__publish"))
      assert(!spark.catalog.tableExists(s"${fqn}__compact"))
      assert(spark.table(fqn).count() == 6)
    }
    locally { // supersede: full overwrite
      val (store, fqn) = plant()
      store.savePartitioned(Seq((100L, 1L, 0L)).toDF("id", "v", "p"),
        "fact", "t", Seq("p"))
      assert(!spark.catalog.tableExists(s"${fqn}__publish"))
      assert(!spark.catalog.tableExists(s"${fqn}__compact"))
      assert(store.load("fact", "t").count() == 1)
    }
  }

  test("row 8 — {__publish}, no stage (crashed superseding overwrite): " +
      "unprovable table; EVERY mutator refuses including the compaction " +
      "resume (r20: was a silent defensive clear); only the retried " +
      "overwrite clears it") {
    val (store, fqn) = partedStore()
    spark.sql(s"CREATE TABLE ${fqn}__publish (pending INT) USING parquet")
    val e1 = intercept[IllegalStateException] {
      store.upsert(Seq((9L, 9L, 1L)).toDF("id", "v", "p"), "fact", "t",
        Seq("id"))
    }
    assert(e1.getMessage.contains("pending"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Compaction.compactPartitions(spark, fqn, "p >= 0", 1000L)
    }
    assert(e2.getMessage.contains("cannot heal") &&
      e2.getMessage.contains("retry the full overwrite"), e2.getMessage)
    val e3 = intercept[IllegalStateException] {
      store.savePartitioned(Seq((9L, 9L, 1L)).toDF("id", "v", "p"),
        "fact", "t", Seq("p"), org.apache.spark.sql.SaveMode.Append)
    }
    assert(e3.getMessage.contains("pending"), e3.getMessage)
    assert(spark.catalog.tableExists(s"${fqn}__publish"),
      "refusals must leave the gate standing")
    // the retry lands and lifts the gate only after success
    store.savePartitioned(Seq((100L, 1L, 0L)).toDF("id", "v", "p"),
      "fact", "t", Seq("p"))
    assert(!spark.catalog.tableExists(s"${fqn}__publish"))
    assert(store.load("fact", "t").count() == 1)
  }
}
