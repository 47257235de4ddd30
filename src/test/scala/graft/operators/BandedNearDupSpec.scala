package graft.operators

import graft.SparkSpec

/** The banded (sub-quadratic) near-dup path vs the exact all-pairs
  * reference: precision must be 1 (verify stage is the same exact cosine
  * filter), recall high at near-dup thresholds, and results deterministic.
  */
class BandedNearDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded pairs ⊆ exact pairs (precision 1 by construction)") {
    val exact = pairSet(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    val banded = pairSet(Similarity.cosineNearDupPairsBanded(
      emb, "vec_id", "embedding", threshold = 0.45, dim = 64))
    // low-threshold recall is intentionally ~0 with 16-bit bands (see
    // scaladoc: band width is the sub-quadratic lever; τ=0.45 is IVF
    // territory) — the invariant here is that nothing false survives
    assert(banded.subsetOf(exact), s"false positives: ${banded -- exact}")
    assert(exact.nonEmpty)
  }

  test("near-dup regime (τ=0.9): recall is total on planted duplicates") {
    import org.apache.spark.sql.functions._
    // plant near-dups: copies of the first 20 vectors with one component
    // nudged — cosine vs the original stays ≫ 0.9
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x))
          .as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val exact = pairSet(
      Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.9))
    val banded = pairSet(Similarity.cosineNearDupPairsBanded(
      corpus, "vec_id", "embedding", threshold = 0.9, dim = 64))
    assert(exact.size >= 20, s"planting failed: ${exact.size} pairs")
    assert(banded == exact,
      s"missed: ${exact -- banded}, extra: ${banded -- exact}")
  }

  test("deterministic across runs and layouts") {
    val a = pairSet(Similarity.cosineNearDupPairsBanded(
      emb, "vec_id", "embedding", 0.45, dim = 64))
    val b = pairSet(Similarity.cosineNearDupPairsBanded(
      emb.repartition(7), "vec_id", "embedding", 0.45, dim = 64))
    assert(a == b)
  }
}
