package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join semantics on hand-built frames: greatest right-ts ≤ left-ts
  * per key, equal-ts inclusion, inner vs left behavior.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, 100L, ts("2024-01-01 10:00:05")),
    (2L, 100L, ts("2024-01-01 10:00:10")),
    (3L, 200L, ts("2024-01-01 10:00:01")),
    (4L, 300L, ts("2024-01-01 10:00:30"))
  ).toDF("trade_id", "acct", "trade_ts")

  private lazy val quotes = Seq(
    (100L, 10L, ts("2024-01-01 10:00:00")),
    (100L, 11L, ts("2024-01-01 10:00:05")), // equal-ts: must match trade 1
    (100L, 12L, ts("2024-01-01 10:00:09")),
    (200L, 20L, ts("2024-01-01 10:00:02"))  // after trade 3: no match
  ).toDF("acct", "quote_id", "quote_ts")

  test("matches greatest right ts ≤ left ts, inclusive at equality") {
    val got = AsOfJoin.asOf(trades, quotes, "acct", "trade_ts", "quote_ts",
      Seq("quote_id", "quote_ts"))
      .select("trade_id", "quote_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 11L, 2L -> 12L)) // 3: quote later; 4: no quotes
  }

  test("left variant keeps unmatched probe rows with null right columns") {
    val got = AsOfJoin.asOf(trades, quotes, "acct", "trade_ts", "quote_ts",
      Seq("quote_id", "quote_ts"), joinType = "left")
    assert(got.count() == 4)
    assert(got.filter($"quote_id".isNull).select("trade_id")
      .as[Long].collect().toSet == Set(3L, 4L))
  }

  test("inner keeps a match whose first carried column is NULL") {
    // the matched quote has a NULL quote_id: match-existence must be judged
    // on the match struct, not a projected field
    val q = Seq(
      (100L, Option.empty[Long], ts("2024-01-01 10:00:00")))
      .toDF("acct", "quote_id", "quote_ts")
    val got = AsOfJoin.asOf(trades.filter($"trade_id" === 1L), q,
      "acct", "trade_ts", "quote_ts", Seq("quote_id", "quote_ts"))
    assert(got.count() == 1)
    assert(got.select("quote_id").head().isNullAt(0))
  }

  test("one shuffle: a single window exchange in the plan") {
    val df = AsOfJoin.asOf(trades, quotes, "acct", "trade_ts", "quote_ts",
      Seq("quote_id"))
    val nExchanges = df.queryExecution.optimizedPlan.toString
      .linesIterator.count(_.contains("RepartitionByExpression"))
    // logical plan has no explicit repartition; physical adds exactly the
    // window's hash partitioning — assert via physical plan
    val phys = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(phys).size <= 2, phys)
    assert(nExchanges == 0)
  }
}
