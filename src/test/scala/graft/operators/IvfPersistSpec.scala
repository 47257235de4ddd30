package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted-IVF contract: the save → load → query path must be
  * frame-identical to querying the in-memory index (same centroids, same
  * assignments, same ranking), the load path must not train, and malformed
  * index tables must fail loudly (the crossLshPairsFromIndex rule), not
  * return silently-wrong neighbors.
  */
class IvfPersistSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val qs = emb.filter($"vec_id" < 8)

  private def base = s"/tmp/graft-ivf-spec-${java.util.UUID.randomUUID()}"

  test("save → load → topk is frame-identical to the in-memory index") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val mem = Similarity.ivfTopK(idx, qs, "vec_id", "embedding",
      k = 5, nProbe = 4).collect().map(_.toSeq).toSet
    val p = base
    Similarity.saveIvfIndex(idx, p)
    val disk = Similarity.ivfTopKFromIndex(
      spark.read.parquet(p + "/centroids"), spark.read.parquet(p + "/vectors"),
      qs, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(mem == disk)
    assert(mem.nonEmpty)
  }

  test("loaded centroids reproduce the trained matrix exactly") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val p = base
    Similarity.saveIvfIndex(idx, p)
    val loaded = Similarity.loadIvfIndex(
      spark.read.parquet(p + "/centroids"), spark.read.parquet(p + "/vectors"))
    assert(loaded.centroids.length == idx.centroids.length)
    idx.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq) // parquet DOUBLE roundtrip is bit-exact
    }
  }

  test("malformed index tables fail loudly") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val p = base
    Similarity.saveIvfIndex(idx, p)
    val goodC = spark.read.parquet(p + "/centroids")
    val goodV = spark.read.parquet(p + "/vectors")
    // wrong vectors table (missing the assignment column)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(goodC, goodV.drop("centroid"))
    }
    assert(e1.getMessage.contains("vectors table"), e1.getMessage)
    // wrong centroid table shape
    val e2 = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(goodC.withColumnRenamed("centroid_id", "cid"), goodV)
    }
    assert(e2.getMessage.contains("centroid table"), e2.getMessage)
    // non-dense centroid ids (e.g. a partial write) must not silently
    // mis-route probes
    val e3 = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(
        goodC.withColumn("centroid_id", $"centroid_id" + 1), goodV)
    }
    assert(e3.getMessage.contains("dense"), e3.getMessage)
    // empty centroid table
    val e4 = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(goodC.filter(lit(false)), goodV)
    }
    assert(e4.getMessage.contains("empty"), e4.getMessage)
  }
}
