package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema shape, deterministic stub decode, batched
  * mapPartitions flow, frame-grain explode.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val media = Multimodal
    .withMediaColumns(docs, "doc_id", "text", "image/stub")
    .select("media_id", "media_type", "content")
    .as[Multimodal.MediaRow]

  test("media columns carry binary content + typed metadata") {
    val df = Multimodal.withMediaColumns(docs, "doc_id", "text", "image/stub")
    assert(df.schema("content").dataType.typeName == "binary")
    val meta = df.select($"meta.nBytes", length($"content").cast("long"))
      .as[(Long, Long)].collect()
    meta.foreach { case (n, l) => assert(n == l) }
  }

  test("feature extraction is deterministic, partition-preserving, normalized") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .sortBy(_.media_id)
    // batch size must not change results (only the call shape)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    f1.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // histogram normalized
      assert(f.width >= 64 && f.width < 256 && f.height >= 64 && f.height < 256)
    }
    assert(f1.length == docs.count())
  }

  test("frame sampling emits ≤ n deterministic frames per media row") {
    val frames = Multimodal.sampleFrames(media, nFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach { fs =>
      assert(fs.length <= 4 && fs.map(_.frame_idx).distinct.length == fs.length)
      fs.foreach(f => assert(f.frame_digest.length == 32))
    }
    // deterministic across runs
    val again = Multimodal.sampleFrames(media, nFrames = 4).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.frame_digest)).toSet
      == again.map(f => (f.media_id, f.frame_idx, f.frame_digest)).toSet)
  }
}
