package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity-search semantics: exact cosine math, brute-force top-k
  * correctness, IVF recall vs brute force.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine of hand-computed vectors") {
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    assert(pairs.contains((1L, 2L, 0.0)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L
      && math.abs(p._3 - 0.7071) < 1e-4))
  }

  test("brute-force top-k ranks by cosine desc with id tie-break") {
    val queries = emb.filter($"vec_id" < 3)
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val byQ = topk.select("qid", "rank", "neighbor")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
    // self never appears
    assert(!topk.filter($"qid" === $"neighbor").head(1).nonEmpty)
  }

  test("knnGraph == bruteForceTopK with the whole corpus as queries") {
    val k = 3
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k)
      .select("qid", "rank", "neighbor").as[(Long, Int, Long)]
      .collect().toSet
    val bf = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
      .select("qid", "rank", "neighbor").as[(Long, Int, Long)]
      .collect().toSet
    assert(g == bf)
    assert(g.map(_._1).size == emb.count()) // every vector has neighbors
    // partial top-k never drops a global winner across block boundaries:
    // exercised with a different block count too
    val g4 = Similarity.knnGraph(emb, "vec_id", "embedding", k, nBlocks = 4)
      .select("qid", "rank", "neighbor").as[(Long, Int, Long)].collect().toSet
    assert(g4 == bf)
  }

  test("IVF top-k achieves high recall vs brute force at nProbe=4/16") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 16)
    val ivf = Similarity.ivfTopK(idx, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // and it scans fewer vectors than brute force by construction:
    // every query touches ≤ nProbe of nCentroids partitions
  }

  test("cosine near-dup pairs respect the threshold") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .collect()
    pairs.foreach(r => assert(r.getDecimal(2).doubleValue() >= 0.45))
  }

  test("blocked pair join is exact: equals the all-pairs reference set") {
    // reference: O(n²) pair set computed test-side from collected vectors
    val vecs = emb.select($"vec_id".cast("long"),
      Similarity.toDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      if cos(vecs(i)._2, vecs(j)._2) >= 0.45
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    // block counts 1 (trivially exact) and 7 (blocks smaller than the
    // pair spread) must both reproduce it — exercises same-block dedup
    // and cross-block once-only generation
    Seq(1, 7).foreach { b =>
      val got = Similarity
        .cosineNearDupPairs(emb, "vec_id", "embedding", 0.45, nBlocks = b)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"nBlocks=$b mismatch")
    }
  }

  test("near-dup plan is a distributed equi-join: no cartesian, no BNLJ") {
    val plan = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("contrastive negatives via IVF: column/type parity + recall vs brute") {
    val anchors = emb.filter($"vec_id" < 5)
    val bf = Similarity.contrastivePairs(emb, "vec_id", "embedding",
      anchors, k = 5, threshold = 0.9, dim = 64)
    val ivf = Similarity.contrastivePairs(emb, "vec_id", "embedding",
      anchors, k = 5, threshold = 0.9, dim = 64,
      negativesVia = NegativesIvf(nCentroids = 16, nProbe = 8))
    // identical output surface regardless of the mining path
    assert(ivf.schema == bf.schema)
    val bfNeg = bf.filter($"pair_type" === "negative")
      .select("anchor", "other").as[(Long, Long)].collect().toSet
    val ivfNeg = ivf.filter($"pair_type" === "negative")
      .select("anchor", "other").as[(Long, Long)].collect().toSet
    val recall = (bfNeg intersect ivfNeg).size.toDouble / bfNeg.size
    assert(recall >= 0.5, s"IVF negative recall $recall too low")
    // positives are independent of the negative path
    val pos = (df: org.apache.spark.sql.DataFrame) =>
      df.filter($"pair_type" === "positive")
        .select("anchor", "other").as[(Long, Long)].collect().toSet
    assert(pos(ivf) == pos(bf))
  }

  test("cosineAtLeast/cosineBelow: null fails, boundaries hold, guard trips") {
    val df = Seq(
      (1L, Some(0.95)), (2L, Some(-1.0)), (3L, Option.empty[Double]),
      (4L, Some(1.0))).toDF("id", "c")
    def ids(p: org.apache.spark.sql.Column): Set[Long] =
      df.filter(p).select("id").as[Long].collect().toSet
    // >= -1 admits every DEFINED cosine including the exact boundary;
    // null (zero-norm) must fail even at the most permissive threshold
    assert(ids(Similarity.cosineAtLeast($"c", -1.0)) == Set(1L, 2L, 4L))
    assert(ids(Similarity.cosineAtLeast($"c", 1.0)) == Set(4L))
    // < 1 admits everything defined below the top; null still fails
    assert(ids(Similarity.cosineBelow($"c", 1.0)) == Set(1L, 2L))
    assert(ids(Similarity.cosineBelow($"c", -1.0)) == Set.empty)
    // the predicate is non-nullable, so keying on it can never spawn a
    // constraint-propagated refilter of the wrapped expression
    assert(!df.select(Similarity.cosineAtLeast($"c", 0.5).as("p"))
      .schema("p").nullable)
    intercept[IllegalArgumentException] { Similarity.cosineAtLeast($"c", -1.01) }
    intercept[IllegalArgumentException] { Similarity.cosineBelow($"c", 1.01) }
  }

  test("contrastive thresholds outside [-1, 1] are rejected loudly") {
    // a threshold > 2 would turn the +2 null-cosine sentinel in the
    // negatives filter into a match
    intercept[IllegalArgumentException] {
      Similarity.contrastivePairs(emb, "vec_id", "embedding",
        emb.filter($"vec_id" < 5), k = 5, threshold = 2.5, dim = 64)
    }
  }

  test("IVF index sampling is deterministic: same centroids across runs") {
    val c1 = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
      .centroids.map(_.toSeq).toSeq
    val c2 = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
      .centroids.map(_.toSeq).toSeq
    assert(c1 == c2)
  }

  test("the training sample floors at 4·C: asking for more centroids " +
    "than the sample has points trains instead of crashing (the n > 1e8 " +
    "auto-size regression, exercised cheaply via a tiny sampleSize)") {
    // pre-round-15: sampleSize=50 < nCentroids=100 hit trainKMeans's
    // `points.length >= k` require — the exact failure the C ≈ √n
    // auto-size rule produced past n ≈ 1e8 rows with the default sample
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 100, sampleSize = 50)
    assert(idx.centroids.length == 100)
    // and the built index is usable end-to-end
    val hits = Similarity.ivfTopK(idx,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 2,
      nProbe = 4)
    assert(hits.count() > 0)
    // a corpus genuinely smaller than C still fails loudly (the sample
    // cannot be raised past the corpus)
    val tiny = emb.limit(20)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfIndex(tiny, "vec_id", "embedding", nCentroids = 100)
    }
    assert(e.getMessage.contains("k-means needs at least"), e.getMessage)
  }

  test("non-finite assignment: NaN-coordinate AND overflow-magnitude " +
    "vectors land in the -1 sentinel cell (quarantine, not cell-0 " +
    "crowding); finite vectors select real cells") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
    val probeDf = Seq(
      (1000L, Array.fill(64)(Double.NaN)), // every distance NaN
      // finite coordinates of extreme magnitude: every squared distance
      // overflows to +Infinity — the advice-caught second flavor, which
      // the old full sort padded with real centroid ids in index order
      (1001L, Array.fill(64)(1e200)),
      (1002L, Array.fill(64)(0.1))
    ).toDF("vec_id", "embedding")
    val out = Similarity.clusterAssignments(idx, probeDf, "vec_id",
        "embedding", probes = 2)
      .select("vid", "cluster").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out(1000L) == Set(-1), s"all-NaN must quarantine: ${out(1000L)}")
    assert(out(1001L) == Set(-1),
      s"all-Infinity must quarantine: ${out(1001L)}")
    assert(out(1002L).size == 2 && out(1002L).forall(c => c >= 0 && c < 8),
      s"finite vector must select two real cells: ${out(1002L)}")
  }
}
