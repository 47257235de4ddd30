package graft.streaming

import graft.SparkSpec
import graft.core.{PipelineConfig, TableStore}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Streaming corpus ingest: batch-internal and cross-batch exact dedup,
  * incremental drops land only genuinely new content, and a restart with
  * the same checkpoint re-ingests nothing.
  */
class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Write `df` as a single parquet file named `name` inside `dir`. */
  private def dropFile(df: org.apache.spark.sql.DataFrame, dir: Path,
                       name: String): Unit = {
    val stage = Files.createTempDirectory("graft-doc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("incremental drops land only new content; replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val distinctTexts = docs.select(md5($"text")).distinct().count()

    val src = Files.createTempDirectory("graft-doc-src")
    Files.copy(Paths.get(s"$sf/documents.parquet"), src.resolve("a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val config = PipelineConfig(catalog =
      "ds" + java.util.UUID.randomUUID().toString.replace("-", "").take(8))
    val store = new TableStore(spark, config)
    try {
      val ckpt = Files.createTempDirectory("graft-doc-ckpt").toString
      def run(): Unit = {
        val q = new DocStreams.StreamingCorpusIngest(spark, store,
          src.toString, ckpt).start()
        q.awaitTermination()
      }
      run()
      val afterFirst = store.load("clean", "documents").count()
      assert(afterFirst == distinctTexts,
        s"first drop lands one row per distinct text: $afterFirst vs $distinctTexts")

      // second drop: 10 re-crawled docs (new ids, OLD text → duplicates)
      // and 10 genuinely new docs
      val recrawled = docs.limit(10)
        .select(($"doc_id" + 10000L).as("doc_id"), $"text", $"lang",
          $"source", $"n_chars")
      val fresh = (0 until 10).map(i =>
        (20000L + i, s"genuinely new content number $i with enough words",
          "en", "srcX", 40L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      dropFile(recrawled.unionByName(fresh), src, "b.parquet")
      run()
      val afterSecond = store.load("clean", "documents")
      assert(afterSecond.count() == afterFirst + 10,
        "only the 10 fresh docs land; re-crawled text dedups away")
      assert(afterSecond.filter($"doc_id" >= 20000L).count() == 10)
      assert(afterSecond.filter($"doc_id" >= 10000L && $"doc_id" < 20000L)
        .count() == 0, "re-crawled ids never land")

      // restart with the SAME checkpoint: nothing re-ingests
      run()
      assert(store.load("clean", "documents").count() == afterFirst + 10)

      // CATALOG LOSS with surviving files (in-memory metastore restart):
      // back the table dir up, drop the catalog entry (which purges the
      // managed files), restore the files — catalog empty, data present.
      // A new drop of pure duplicates must still dedup to nothing.
      val loc = store.tablePath("clean", "documents")
      val backup = Files.createTempDirectory("graft-doc-backup")
      def copyTree(from: Path, to: Path): Unit = {
        Files.walk(from).forEach { p =>
          val t = to.resolve(from.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(t)
          else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
        }
      }
      copyTree(Paths.get(loc.toUri.getPath), backup)
      spark.sql(s"DROP TABLE ${store.fqn("clean", "documents")}")
      copyTree(backup, Paths.get(loc.toUri.getPath))
      assert(!spark.catalog.tableExists(store.fqn("clean", "documents")))

      dropFile(docs.limit(5)
        .select(($"doc_id" + 30000L).as("doc_id"), $"text", $"lang",
          $"source", $"n_chars"), src, "c.parquet")
      run()
      val afterRecovery = store.load("clean", "documents")
      assert(afterRecovery.count() == afterFirst + 10,
        "post-recovery duplicate drop must land nothing")
      assert(afterRecovery.filter($"doc_id" >= 30000L).count() == 0)
    } finally store.dropAll()
  }
}
