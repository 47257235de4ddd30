package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based exactness check of the IVF ANN path: probing EVERY cell
  * must return exactly the brute-force top-k — on both physical routes of
  * the probe join. On random corpora this pins three claims at once:
  * the Voronoi assignment is a PARTITION (no corpus vector dropped or
  * duplicated across cells — a double-membership would surface as a
  * duplicate candidate row and break ranks), the broadcast and shuffled
  * routes are result-identical, and the shuffled route's two-stage top-k
  * is lossless (a per-bucket partial winner set covers the global
  * winners) including under cosine ties broken by neighbor id.
  */
class SimilarityPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(4)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString) // status carries the counterexample
  }

  // small-int coordinates force exact cosine ties (duplicated vectors);
  // nonzero guard keeps cosine defined
  private def vecsGen(count: Int, firstId: Long): Gen[List[(Long, Array[Float])]] =
    Gen.listOfN(count, Gen.listOfN(4, Gen.choose(-3, 3).map(_.toFloat))
      .suchThat(_.exists(_ != 0f)))
      .map(_.zipWithIndex.map { case (v, i) => (firstId + i, v.toArray) })

  test("ivfTopK probing all cells = bruteForceTopK, on both join routes") {
    val nCells = 3
    check(Prop.forAll(vecsGen(12, 0L), vecsGen(3, 100L), Gen.choose(1, 4)) {
      (cs, qs, k) =>
        val corpus = cs.toDF("vec_id", "embedding")
        val queries = qs.toDF("vec_id", "embedding")
        val index = Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells)
        def rows(df: org.apache.spark.sql.DataFrame) =
          df.as[(Long, Long, Int, BigDecimal)].collect()
            .map { case (q, nb, r, c) => (q, nb, r, c.doubleValue) }.toSet
        val brute = rows(Similarity
          .bruteForceTopK(corpus, queries, "vec_id", "embedding", k))
        val viaBroadcast = rows(Similarity.ivfTopK(index, queries,
          "vec_id", "embedding", k, nProbe = nCells,
          broadcastQueries = Some(true)))
        val viaShuffle = rows(Similarity.ivfTopK(index, queries,
          "vec_id", "embedding", k, nProbe = nCells,
          broadcastQueries = Some(false)))
        viaBroadcast == brute && viaShuffle == brute
    })
  }
}
