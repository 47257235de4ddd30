package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact, oracle-checkable) with the
  * small query side broadcast so the big corpus never shuffles. Scale path:
  * IVF — a coarse k-means quantizer assigns every vector to a centroid
  * partition and queries probe only the `nProbe` nearest centroids, cutting
  * scanned vectors by ~k/nProbe while keeping recall high.
  *
  * All vector math is `transform`/`zip_with`/`aggregate` higher-order
  * functions over the array column — evaluated row-local inside codegen'd
  * stages, no UDF serialization boundary.
  */
object Similarity {

  /** Cast float embedding to double once, for stable downstream math. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ as a strict left fold (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Corpus projection with precomputed norm — norms are computed once per
    * vector, not once per pair.
    */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  /** Exact top-k nearest neighbors (cosine) of each query vector.
    *
    * The query side is broadcast → BroadcastNestedLoopJoin: every corpus
    * partition streams once past the in-memory queries; no corpus shuffle.
    * Ranking is a per-query window with a deterministic id tie-break.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
    val q = withNorm(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = c.join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("cosine", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid").as("neighbor"), col("rank"),
        col("cosine").cast("decimal(18,4)").as("cosine"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (ids ordered).
    * Brute-force O(n²) pair scan — correct at any scale but quadratic; at
    * 100TB use `ivfIndex` buckets (or SimHash over sign bits) to restrict
    * the pair space first.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val c = withNorm(df, idCol, vecCol)
    val a = c.select(col("vid").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = c.select(col("vid").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        col("cosine").cast("decimal(18,4)").as("cosine"))
  }

  /** IVF index: assign every vector to its nearest of `nCentroids` k-means
    * centroids (trained with a fixed seed on a bounded sample — driver holds
    * only the centroid matrix, never the corpus).
    */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int, seed: Long = 42L,
               sampleSize: Int = 10000): IvfIndex = {
    import org.apache.spark.mllib.clustering.KMeans
    import org.apache.spark.mllib.linalg.Vectors
    val c = withNorm(df, idCol, vecCol)
    val sample = c.select("v").limit(sampleSize).collect()
      .map(r => Vectors.dense(r.getSeq[Double](0).toArray))
    val sc = df.sparkSession.sparkContext
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIterations(10)
      .setInitializationMode("k-means||")
      .run(sc.parallelize(sample.toIndexedSeq, 4))
    val centroids = model.clusterCenters.map(_.toArray)
    IvfIndex(assign(c, centroids, 1).select(
      col("vid"), col("v"), col("nrm"), col("c0").as("centroid")), centroids)
  }

  /** Nearest-`p` centroid ids (by squared L2) as columns c0..c(p-1). */
  private def assign(vecs: DataFrame, centroids: Array[Array[Double]],
                     p: Int): DataFrame = {
    val cLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
    // squared distance to each centroid, then take indices of the p smallest
    val dists = transform(cLit, c =>
      aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
    val indexed = transform(dists, (d, i) => struct(d.as("d"), i.as("i")))
    val sorted = array_sort(indexed)
    val probes = (0 until p).map(i => sorted.getItem(i).getField("i").as(s"c$i"))
    vecs.select(col("*") +: probes: _*)
  }

  /** Approximate top-k via IVF: queries probe their `nProbe` nearest
    * centroid partitions only; within the probed buckets ranking is exact.
    * Scanned-vector count drops from n to ~n·nProbe/nCentroids.
    */
  def ivfTopK(index: IvfIndex, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val q0 = withNorm(queries, idCol, vecCol)
    val q = assign(q0, index.centroids, nProbe)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(array((0 until nProbe).map(i => col(s"c$i")): _*))
          .as("probe"))
    index.vectors
      .join(broadcast(q),
        col("centroid") === col("probe") && col("vid") =!= col("qid"))
      .withColumn("cosine", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid").as("neighbor"), col("rank"),
        col("cosine").cast("decimal(18,4)").as("cosine"))
  }
}

/** Vectors tagged with their centroid partition + the centroid matrix. */
final case class IvfIndex(vectors: DataFrame, centroids: Array[Array[Double]])
