package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The recomposed cosine (`dot(a,b) / (‖a‖·‖b‖)` with norms precomputed
  * by [[Similarity.l2NormNative]]) must be BIT-identical to the fused
  * [[CosineSimilarity]] kernel — the r20 optimization moved the norm
  * work out of the pair loop on the strength of exactly this equality
  * (`sqrt(Σa²)·sqrt(Σb²)` is the fused denominator verbatim, and the
  * dot is the same strict left fold), and every similarity operator's
  * oracle hash rides on it. Null semantics must compose identically
  * too: length mismatch, null elements, zero norms, empty vectors.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def compare(rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])],
                      tag: String): Unit = {
    val df = rows.toDF("a", "b")
      .select(Similarity.toDouble($"a").as("a"),
        Similarity.toDouble($"b").as("b"))
    val got = df.select(
      Similarity.cosine($"a", $"b").as("fused"),
      Similarity.cosineFromNorms($"a", $"b",
        Similarity.l2NormNative($"a"), Similarity.l2NormNative($"b"))
        .as("split"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val f = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val s = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      // bit-level comparison: NaN != NaN under ==, and -0.0 == 0.0 —
      // doubleToRawLongBits pins both
      assert(f.map(java.lang.Double.doubleToRawLongBits) ==
        s.map(java.lang.Double.doubleToRawLongBits),
        s"$tag row $i: fused=$f split=$s (a=${rows(i)._1} b=${rows(i)._2})")
    }
  }

  test("bit-identical to the fused kernel on random vectors") {
    val rnd = new scala.util.Random(7)
    def vec(n: Int): Seq[java.lang.Double] =
      Seq.fill(n)(Double.box(rnd.nextDouble() * 2 - 1))
    val rows = (1 to 500).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (vec(n), vec(n))
    }
    compare(rows, "random")
  }

  test("adversarial shapes: zero vectors, nulls, mismatch, denormals") {
    val z: java.lang.Double = 0.0
    val nul: java.lang.Double = null
    val tiny = Double.box(java.lang.Double.MIN_VALUE)
    val big = Double.box(1e300)
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      (Seq(z, z, z), Seq(Double.box(1.0), Double.box(2.0), Double.box(3.0))),
      (Seq(z, z), Seq(z, z)),
      (Seq.empty, Seq.empty),
      (Seq(Double.box(1.0), nul), Seq(Double.box(1.0), Double.box(2.0))),
      (Seq(Double.box(1.0)), Seq(Double.box(1.0), Double.box(2.0))),
      (Seq(tiny, tiny), Seq(tiny, tiny)),
      (Seq(big, big), Seq(big, big)),
      (Seq(Double.box(-1.0), Double.box(1.0)),
        Seq(Double.box(1.0), Double.box(-1.0))),
      (Seq(Double.box(Double.NaN), Double.box(1.0)),
        Seq(Double.box(1.0), Double.box(1.0))))
    compare(rows, "adversarial")
  }

  test("dot_product null semantics: mismatch and null elements yield null") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0))
    ).toDF("a", "b")
    val ok = df.select(Similarity.dotNative($"a", $"b")).head().getDouble(0)
    assert(ok == 11.0)
    val mm = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Similarity.dotNative($"a", $"b")).head()
    assert(mm.isNullAt(0))
  }
}
