package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Host-budget semantics: the cap binds per host, survivors are the
  * lowest-order rows, pre-cap totals are carried, under-cap hosts pass
  * through whole.
  */
class HostBudgetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("big.com", 1L), ("big.com", 2L), ("big.com", 3L), ("big.com", 4L),
    ("small.org", 10L), ("small.org", 11L))
    .toDF("host", "doc_id")

  test("cap binds: at most maxPerHost survivors, lowest order kept") {
    val out = HostBudget.capPerHost(df, "host", Seq(col("doc_id")), 2)
      .select($"host", $"doc_id", $"host_rank", $"host_total")
      .as[(String, Long, Int, Long)].collect()
    val byHost = out.groupBy(_._1)
    assert(byHost("big.com").map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(byHost("big.com").forall(_._4 == 4L), "pre-cap total carried")
    assert(byHost("small.org").map(_._2).sorted.toSeq == Seq(10L, 11L),
      "under-cap host passes through whole")
    assert(out.forall(r => r._3 >= 1 && r._3 <= 2))
  }

  test("null host is one capped group, not silently dropped") {
    // malformed URLs extract a null host; the window treats them as one
    // partition, so the cap (and the null-safe totals join) must too
    val withNulls = df.unionByName(
      Seq((null.asInstanceOf[String], 20L), (null.asInstanceOf[String], 21L),
        (null.asInstanceOf[String], 22L)).toDF("host", "doc_id"))
    val out = HostBudget.capPerHost(withNulls, "host", Seq(col("doc_id")), 2)
      .filter(col("host").isNull)
      .select($"doc_id", $"host_rank", $"host_total")
      .as[(Long, Int, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == Seq(20L, 21L),
      "null-host rows must be capped like any host, not dropped")
    assert(out.forall(_._3 == 3L), "pre-cap total carried for null host")
  }

  test("rank follows the order columns, 1-based and dense") {
    val out = HostBudget.capPerHost(df, "host", Seq(col("doc_id")), 10)
      .select($"host", $"doc_id", $"host_rank")
      .as[(String, Long, Int)].collect()
    assert(out.filter(_._1 == "big.com").sortBy(_._2).map(_._3).toSeq
      == Seq(1, 2, 3, 4))
  }
}
