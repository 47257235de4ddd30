package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (doc_id, source, n_tokens)
    (1L, "a", 1000L), (2L, "a", 1000L), (3L, "a", 1000L),
    (4L, "a", 1000L), (5L, "a", 1000L),
    (10L, "b", 3000L), (11L, "b", 10L)
  ).toDF("doc_id", "source", "n_tokens")

  test("contiguous cumsum packing with capacity 2048") {
    val got = Packing.packContiguous(docs, "source", "doc_id", "n_tokens", 2048L)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // group a: cum_before 0,1000,2000,3000,4000 → packs 0,0,0,1,1
    // group b: cum_before 0,3000 → packs 0,1 (single doc may overrun)
    assert(got.map(r => (r._1, r._4)) ==
      Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
        (10L, 0L), (11L, 1L)))
  }

  test("pack totals overrun capacity by at most one document") {
    val packed = Packing.packContiguous(docs, "source", "doc_id", "n_tokens", 2048L)
    val overrun = packed.groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tot"), max("n_tokens").as(("biggest")))
      .filter(col("tot") - col("biggest") >= 2048L)
    assert(overrun.count() == 0)
  }

  test("groups pack independently and ids stay complete") {
    val packed = Packing.packContiguous(docs, "source", "doc_id", "n_tokens", 2048L)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").as[Long].collect().toSet ==
      docs.select("doc_id").as[Long].collect().toSet)
  }

  test("pack ids are monotone in doc order within a group (contiguity)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"source",
        graft.functions.TextAnalysis.estimatedBpeTokens($"text").as("n_tokens"))
    val packed = Packing.packContiguous(real, "source", "doc_id", "n_tokens", 2048L)
      .select("source", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    packed.foreach { case (src, rows) =>
      val byDoc = rows.sortBy(_._2).map(_._3)
      assert(byDoc.zip(byDoc.tail).forall { case (a, b) => a <= b },
        s"non-monotone packs in $src")
      assert(byDoc.head == 0L, s"first pack of $src must be 0")
    }
  }
}
