package graft.operators

import graft.SparkSpec

/** Leakage-safe split semantics: every member of a near-dup cluster draws
  * the cluster's split, singletons keep sp1's row-level assignment
  * verbatim.
  */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("cluster members share one split; singletons keep sp1's") {
    val docs = Seq(1L, 2L, 3L, 10L, 20L).toDF("doc_id")
    // chain 1~2, 2~3 → cluster {1,2,3} canonical 1; 10 and 20 singletons
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Splits.clusterSafeSplit(docs, "doc_id", pairs, "doc_a", "doc_b")
      .select($"doc_id", $"split_key", $"split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    assert(got.keySet == Set(1L, 2L, 3L, 10L, 20L), "every doc assigned")
    assert(Seq(1L, 2L, 3L).map(got(_)._1).distinct == Seq(1L),
      "cluster members bucket on the canonical id")
    assert(Seq(1L, 2L, 3L).map(got(_)._2).distinct.length == 1,
      "cluster members share one split")
    // singletons: split_key is their own id and the split equals sp1's
    val sp1 = Splits.assignSplit(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    Seq(10L, 20L).foreach { id =>
      assert(got(id)._1 == id)
      assert(got(id)._2 == sp1(id), s"singleton $id diverged from sp1")
    }
    // the cluster's shared split is exactly sp1's assignment of canonical 1
    assert(got(1L)._2 == sp1(1L))
  }

  test("no pairs → identical to assignSplit on every row") {
    val docs = (1L to 50L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Splits.clusterSafeSplit(docs, "doc_id", empty, "doc_a", "doc_b")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val sp1 = Splits.assignSplit(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(got == sp1)
  }
}
