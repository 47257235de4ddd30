package graft.operators

import org.apache.spark.sql.functions.{array, col, lit, sin}

/** One-off audit: what the round-16 bucketed index layout is worth in
  * wall-clock at a tier where the corpus-side exchange does real work —
  * the same honesty rule as [[IvfRouteProbe]]: local exchanges are
  * in-memory copies, so the local delta UNDERSTATES the cluster win
  * (where the elided exchange is a network shuffle of the corpus); what
  * the local number proves is that the bucketed path is never slower
  * and the layout's plan effect survives execution, not just planning.
  *
  * Shape: `knnGraphApprox` (k=5, nProbe=2) over a 64-d synthetic corpus
  * at C = √n, loaded from (a) the plain parquet index and (b) the
  * bucketed managed tables. A/B-interleaved, min per form, untimed
  * warmup.
  *
  * Run: `sbt "Test/runMain graft.operators.BucketedIndexProbe [n]"` —
  * n defaults to 64000.
  */
object BucketedIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val n = args.headOption.map(_.toLong).getOrElse(64000L)
    println(s"synthetic corpus: $n vectors, 64-d")
    val emb = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 64).map(i =>
        sin(col("id") * lit(0.61 + i * 0.137) + lit(i))): _*)
        .as("embedding"))
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = Similarity.ivfSizing(n))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bucketed-probe").toString
    Similarity.saveIvfIndex(index, s"$tmp/plain")
    Similarity.saveIvfIndexBucketed(index, "graft_bucketed_probe",
      nBuckets = 32)
    val plain = Similarity.loadIvfIndex(
      spark.read.parquet(s"$tmp/plain/centroids"),
      spark.read.parquet(s"$tmp/plain/vectors"))
    val bucketed =
      Similarity.loadIvfIndexFromTables(spark, "graft_bucketed_probe")
    def shot(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def graph(i: IvfIndex): Long =
      Similarity.knnGraphApprox(i, k = 5, nProbe = 2).count()
    graph(plain) // untimed warmup
    val pairs = (1 to 3).map(_ => (shot(graph(plain)), shot(graph(bucketed))))
    val (p, b) = (pairs.map(_._1._1).min, pairs.map(_._2._1).min)
    println(f"knnGraphApprox: plain $p%.2f s  bucketed $b%.2f s  " +
      f"(bucketed/plain ${b / p}%.2fx, rows ${pairs.head._1._2})")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
