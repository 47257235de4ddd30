package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.core.TableStore
import graft.operators.TextDedup

/** Streaming CORPUS ingest — the continuous form of the incremental-dedup
  * loop: document drops arrive as files, each micro-batch dedups against
  * itself and against everything already landed, and only genuinely new
  * content reaches the clean table. This is [[graft.operators.TextDedup.bloomNewDocs]]
  * (il2) run where it actually lives in production: inside the ingest
  * stream, not as a one-off batch job.
  */
object DocStreams {

  /** The harness documents schema (TESTDATA.md). */
  val docsRawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream → per-batch exact dedup → exactly-once landing.
    *
    * Per micro-batch: (1) batch-internal exact dedup (content digest,
    * deterministic min-doc_id survivor); (2) cross-corpus dedup via the
    * Bloom-prefiltered path — the broadcast filter costs one corpus
    * digest scan, candidates verify exactly, and a mostly-new batch
    * never shuffles the corpus; (3) landing via per-batchId dynamic
    * partition overwrite ([[TableStore.saveBatchPartition]]).
    *
    * Replay idempotence is DOUBLE-covered: a replayed micro-batch finds
    * its own previous landing in the corpus, dedups to empty, and writes
    * nothing — and even a partial previous landing is invisible because
    * the batch's partition overwrite is per-batchId. The checkpoint dir
    * must be stable per logical ingest (the StreamingFactIngest
    * contract); the corpus-existence probe survives catalog loss
    * (in-memory metastore, new JVM) by falling back to the table PATH
    * and reading the surviving parquet directly — dedup is never
    * silently skipped, and `saveBatchPartition` re-registers the
    * catalog entry when the same batch lands (spec-asserted).
    *
    * At 100 TB: per-batch state is the batch plus a ~1.2 GB-per-10⁹-docs
    * broadcast Bloom filter; the corpus is scanned (digest column only)
    * once per micro-batch and never shuffled — batch cadence, not corpus
    * size, sets the ingest cost.
    */
  final class StreamingCorpusIngest(spark: SparkSession, store: TableStore,
                                    sourceDir: String, checkpointDir: String,
                                    layer: String = "clean",
                                    table: String = "documents") {

    def start(): org.apache.spark.sql.streaming.StreamingQuery = {
      val src = spark.readStream.schema(docsRawSchema).parquet(sourceDir)
      src.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val w = Window.partitionBy(col("_di_digest")).orderBy(col("doc_id"))
          val inBatch = batch
            .withColumn("_di_digest", md5(col("text")))
            .withColumn("_di_rn", row_number().over(w))
            .filter(col("_di_rn") === 1)
            .drop("_di_rn", "_di_digest")
          // corpus probe must survive catalog loss (in-memory metastore,
          // new JVM): a catalog-only tableExists would return false while
          // the warehouse files persist, and the first post-restart batch
          // would skip dedup and land duplicates. Probe the catalog FIRST
          // (normal path), then the table PATH (recovery path — read the
          // surviving parquet directly; saveBatchPartition re-registers
          // the catalog entry when it lands this very batch).
          val loc = store.tablePath(layer, table)
          val corpusOpt =
            if (spark.catalog.tableExists(store.fqn(layer, table)))
              Some(store.load(layer, table))
            else if (loc.getFileSystem(
              spark.sparkContext.hadoopConfiguration).exists(loc))
              Some(spark.read.parquet(loc.toString))
            else None
          val fresh = corpusOpt match {
            case Some(corpus) =>
              val newIds = TextDedup.bloomNewDocs(corpus, inBatch,
                "doc_id", "text")
              inBatch.join(newIds, Seq("doc_id"), "left_semi")
            case None => inBatch
          }
          store.saveBatchPartition(
            fresh.withColumn("ingest_batch", lit(batchId)),
            layer, table, "ingest_batch")
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpointDir)
        .start()
    }
  }
}
