package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r20 in-stage top-k combiner ([[KnnTopK]]) must produce a graph
  * IDENTICAL to the row_number-window form it replaced inside
  * [[Similarity.knnGraph]] — same neighbors, same ranks, same cosines —
  * on random corpora and on the degenerate shapes the window's ordering
  * semantics covered: zero-norm vectors (null cosine, ranked last),
  * duplicate vectors (cosine ties broken by id), tiny corpora with
  * fewer than k candidates.
  */
class KnnCombinerSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r20 window-based knnGraph, kept verbatim as the reference. */
  private def windowKnn(df: org.apache.spark.sql.DataFrame,
                        k: Int, nBlocks: Int = 16)
      : org.apache.spark.sql.DataFrame = {
    val c = df.select(col("vec_id").cast("long").as("vid"),
      Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("blk", pmod(xxhash64(col("vid")), lit(nBlocks)).cast("int"))
    val left = c.withColumn("pk", explode(sequence(
        col("blk") * nBlocks + col("blk"),
        col("blk") * nBlocks + lit(nBlocks - 1))))
      .select(col("vid").as("ida"), col("v").as("va"),
        col("blk").as("blk_a"), col("pk"))
    val right = c.withColumn("pk", explode(transform(
        sequence(lit(0), col("blk")), i => i * nBlocks + col("blk"))))
      .select(col("vid").as("idb"), col("v").as("vb"),
        col("blk").as("blk_b"), col("pk"))
    val edges = left.join(right, Seq("pk"))
      .filter(col("blk_a") =!= col("blk_b") || col("ida") < col("idb"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .select(col("pk"), col("cosine"), explode(array(
        struct(col("ida").as("src"), col("idb").as("dst")),
        struct(col("idb").as("src"), col("ida").as("dst")))).as("e"))
      .select(col("pk"), col("e.src").as("src"), col("e.dst").as("dst"),
        col("cosine"))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk"), col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    edges.withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
          .orderBy(col("cosine").desc, col("dst"))))
      .filter(col("rank") <= k)
      .select(col("src").as("qid"), col("dst").as("neighbor"), col("rank"),
        col("cosine").cast("decimal(18,4)").as("cosine"))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val got = Similarity.knnGraph(df, "vec_id", "embedding", k)
    val want = windowKnn(df, k)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"combiner graph differs from window graph (k=$k):\n" +
        s"extra=${got.exceptAll(want).collect().take(5).mkString(",")}\n" +
        s"missing=${want.exceptAll(got).collect().take(5).mkString(",")}")
  }

  test("identical to the window form on a random corpus") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    Seq(1, 3, 5).foreach(k => assertSame(df, k))
  }

  test("degenerate shapes: zero vectors, duplicates, under-k corpora") {
    val z = Seq.fill(4)(0.0f)
    val a = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val rows = Seq(
      0L -> a, 1L -> a, // exact duplicates: cosine tie broken by id
      2L -> z, 3L -> z, // zero norm: null cosine, ranked last
      4L -> Seq(0.0f, 1.0f, 0.0f, 0.0f))
    val df = rows.toDF("vec_id", "embedding")
    Seq(1, 3, 10).foreach(k => assertSame(df, k))
  }

  test("bounded top-k ordering: null below numbers, dst tiebreak") {
    val it = Iterator(
      (1L, 2L, Some(0.5)), (1L, 3L, None), (1L, 4L, Some(0.5)),
      (1L, 5L, Some(0.9)), (1L, 6L, None))
    val got = KnnTopK.combine(it, 3).toSeq
      .filter(_._1 == 1L).map(r => (r._2, r._3))
    assert(got.toSet == Set((5L, Some(0.9)), (2L, Some(0.5)),
      (4L, Some(0.5))), got.toString)
    val onlyNulls = KnnTopK.combine(
      Iterator((1L, 2L, None), (1L, 3L, None)), 1).toSeq
      .filter(_._1 == 1L)
    assert(onlyNulls == Seq((1L, 2L, None)), onlyNulls.toString)
  }
}
