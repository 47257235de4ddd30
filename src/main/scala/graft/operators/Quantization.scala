package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage/IO lever
  * for ANN at 100TB: 4× smaller vectors (float32 → int8 + 2 floats of
  * per-vector scale metadata), with a bounded reconstruction error of
  * half a quantization step per component.
  *
  * Per-vector symmetric min/max quantization: q = round((x − min) / step),
  * step = (max − min) / 255. Pure per-row projections (UDF tight loops —
  * the same HOF-vs-loop tradeoff as shingling), no shuffle; the quantized
  * table is written/partitioned exactly like the full-precision one.
  */
object Quantization {

  final case class QuantizedVec(qmin: Float, qstep: Float, q: Array[Byte])

  private val quantizeUdf = udf { (v: Seq[Double]) =>
    if (v == null || v.isEmpty) null
    else {
      var mn = Double.MaxValue
      var mx = Double.MinValue
      v.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
      val step = if (mx > mn) (mx - mn) / 255.0 else 1.0
      val q = new Array[Byte](v.length)
      var i = 0
      while (i < v.length) {
        q(i) = (math.round((v(i) - mn) / step) - 128).toByte
        i += 1
      }
      QuantizedVec(mn.toFloat, step.toFloat, q)
    }
  }

  private val dequantizeUdf = udf { (qv: QuantizedVec) =>
    if (qv == null) null
    else qv.q.map(b => qv.qmin + ((b & 0xff) ^ 0x80).toDouble * qv.qstep)
  }

  /** Add a `quantized` struct column (qmin, qstep, int8 payload). */
  def quantize(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("quantized",
      quantizeUdf(Similarity.toDouble(col(vecCol))))

  /** Reconstruct an `array<double>` from the quantized struct. */
  def dequantize(df: DataFrame, quantizedCol: String,
                 outCol: String): DataFrame =
    df.withColumn(outCol, dequantizeUdf(col(quantizedCol)))
}
