package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** int8 quantization contract: bounded reconstruction error, 4× payload
  * shrink, and ANN ranking over dequantized vectors stays close to exact.
  */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("roundtrip error ≤ half a quantization step per component") {
    val rt = Quantization.dequantize(
      Quantization.quantize(emb, "embedding"), "quantized", "deq")
      .select(Similarity.toDouble($"embedding").as("v"), $"deq",
        $"quantized.qstep".as("step"))
    val viol = rt.select(
      aggregate(zip_with($"v", $"deq", (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"),
      ($"step" * 0.5 + 1e-9).as("bound"))
      .filter($"maxerr" > $"bound").count()
    assert(viol == 0)
  }

  test("payload is 1 byte per component (4x vs float32)") {
    val row = Quantization.quantize(emb, "embedding")
      .select(size($"embedding").as("dims"),
        length($"quantized.q").as("bytes")).head()
    assert(row.getInt(0) == row.getInt(1)) // 64 dims → 64 bytes
  }

  test("top-k over dequantized vectors ≈ exact top-k (recall ≥ 0.8)") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val deq = Quantization.dequantize(
      Quantization.quantize(emb, "embedding"), "quantized", "deq")
      .select($"vec_id", $"deq".as("embedding"))
    val approx = Similarity.bruteForceTopK(deq,
      deq.filter($"vec_id" < 10), "vec_id", "embedding", 5)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized ANN recall $recall")
  }
}
