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

  test("feature extraction is deterministic, partition-preserving, in-range") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .sortBy(_.media_id)
    // batch size must not change results (only the call shape)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    f1.foreach { f =>
      assert(f.features.length == 8)
      // each feature is hex16/2^16 ∈ [0, 1), exactly representable in FLOAT
      f.features.foreach { v =>
        assert(v >= 0f && v < 1f)
        assert(v * 65536.0f == math.rint(v * 65536.0).toFloat) // k/2^16 exact
      }
      assert(f.width >= 64 && f.width < 256 && f.height >= 64 && f.height < 256)
    }
    assert(f1.length == docs.count())
  }

  test("stub codec values are md5-derived exactly as the mm2 oracle recomputes") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val h = Multimodal.StubCodec.md5Hex(bytes)
    val (w, ht) = Multimodal.StubCodec.decodeDims(bytes)
    assert(w == 64 + Integer.parseInt(h.substring(0, 2), 16) % 192)
    assert(ht == 64 + Integer.parseInt(h.substring(2, 4), 16) % 192)
    val fs = Multimodal.StubCodec.features(bytes)
    assert(fs(0) == Integer.parseInt(h.substring(0, 4), 16) / 65536.0f)
    assert(fs(7) == Integer.parseInt(h.substring(28, 32), 16) / 65536.0f)
  }

  // --- real JDK image decode (ImageIoCodec) ---

  /** A real PNG: `w`×`h`, left half black, right half white. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoCodec decodes a real PNG: true dims, strip-luma features") {
    val bytes = pngBytes(64, 32)
    assert(Multimodal.ImageIoCodec.sniff(bytes).contains("png"))
    val Some((w, h, f)) = Multimodal.ImageIoCodec.decodeFeatures(bytes)
    assert(w == 64 && h == 32)
    assert(f.length == 8)
    // left 4 strips are black (luma 0), right 4 white (luma 1)
    f.take(4).foreach(v => assert(v == 0f, s"black strip: $v"))
    f.drop(4).foreach(v => assert(v == 1f, s"white strip: $v"))
  }

  test("extractFeatures(realDecode): real images get real dims, " +
    "non-images fall back to the stub — in one distributed pass") {
    val png = pngBytes(100, 40)
    val text = "not an image at all".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", png),
      Multimodal.MediaRow(2L, "image/stub", text)).toDS()
    val got = Multimodal.extractFeatures(rows, realDecode = true)
      .collect().sortBy(_.media_id)
    assert(got(0).width == 100 && got(0).height == 40)
    // the non-image row must carry the md5-stub values, bit-for-bit
    val (sw, sh) = Multimodal.StubCodec.decodeDims(text)
    assert(got(1).width == sw && got(1).height == sh)
    assert(got(1).features.toSeq ==
      Multimodal.StubCodec.features(text).toSeq)
    // and the default path is unchanged (the mm* oracle contract)
    val stubbed = Multimodal.extractFeatures(rows).collect()
      .sortBy(_.media_id)
    val (pw, ph) = Multimodal.StubCodec.decodeDims(png)
    assert(stubbed(0).width == pw && stubbed(0).height == ph)
  }

  test("sniff rejects non-image bytes and truncated magics") {
    assert(Multimodal.ImageIoCodec.sniff("hello".getBytes).isEmpty)
    assert(Multimodal.ImageIoCodec.sniff(Array[Byte]()).isEmpty)
    assert(Multimodal.ImageIoCodec.sniff(Array(0x89.toByte)).isEmpty)
    assert(Multimodal.ImageIoCodec.decodeFeatures("x".getBytes).isEmpty)
  }

  test("corrupt-but-sniffable content falls back to the stub instead of " +
    "killing the task") {
    // valid JPEG magic, garbage body — one bad crawl file must not abort
    // a 100 TB job
    val corrupt = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
      "definitely not huffman tables".getBytes("UTF-8")
    assert(Multimodal.ImageIoCodec.sniff(corrupt).contains("jpeg"))
    assert(Multimodal.ImageIoCodec.decodeFeatures(corrupt).isEmpty)
    // truncated real PNG (half the bytes): sniffs, must still fall back
    val truncated = pngBytes(32, 32).take(40)
    assert(Multimodal.ImageIoCodec.sniff(truncated).contains("png"))
    assert(Multimodal.ImageIoCodec.decodeFeatures(truncated).isEmpty)
    val rows = Seq(Multimodal.MediaRow(9L, "image/jpeg", corrupt)).toDS()
    val got = Multimodal.extractFeatures(rows, realDecode = true).collect()
    val (sw, sh) = Multimodal.StubCodec.decodeDims(corrupt)
    assert(got.head.width == sw && got.head.height == sh,
      "corrupt image must take the stub path end to end")
  }

  test("frame sampling emits ≤ n deterministic frames with exact byte offsets") {
    val frames = Multimodal.sampleFrames(media, nFrames = 4).collect()
    val lens = media.collect().map(r => r.media_id -> r.content.length.toLong).toMap
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (id, fs) =>
      assert(fs.length <= 4 && fs.map(_.frame_idx).distinct.length == fs.length)
      val step = math.max(lens(id) / 4, 1L)
      fs.foreach { f =>
        assert(f.frame_digest.length == 32)
        assert(f.frame_start == f.frame_idx * step)
        assert(f.frame_len == math.min((f.frame_idx + 1) * step, lens(id)) - f.frame_start)
        assert(f.frame_start < lens(id))
      }
    }
    // deterministic across runs
    val again = Multimodal.sampleFrames(media, nFrames = 4).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.frame_digest)).toSet
      == again.map(f => (f.media_id, f.frame_idx, f.frame_digest)).toSet)
  }
}
