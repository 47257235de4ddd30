package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DQ gate behavior ≙ `data_quality.py:24-46`: clean frames pass, duplicate
  * keys and out-of-range values fail with `criticality=error`; warns don't
  * gate.
  */
class DQEngineSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    IsUnique(Seq("id")),
    IsInRange("score", -5, 5),
    IsNotNull("name"))

  test("clean frame passes the gate") {
    val df = Seq((1, 3.0, "a"), (2, -5.0, "b"), (3, 5.0, "c"))
      .toDF("id", "score", "name")
    val checked = DQEngine.applyChecks(df, rules)
    assert(checked.filter(size($"_errors") > 0).count() == 0)
    DQEngine.gate(checked) // must not throw
  }

  test("duplicate key rows are flagged and fail the gate") {
    val df = Seq((1, 1.0, "a"), (1, 2.0, "b"), (3, 3.0, "c"))
      .toDF("id", "score", "name")
    val checked = DQEngine.applyChecks(df, rules)
    val flagged = checked.filter(array_contains($"_errors", "is_unique_id"))
      .select("id").as[Int].collect().toSet
    assert(flagged == Set(1))
    assertThrows[DQViolationException](DQEngine.gate(checked))
  }

  test("out-of-range and null values are flagged with rule names") {
    val df = Seq((1, 7.0, "a"), (2, 3.0, null.asInstanceOf[String]))
      .toDF("id", "score", "name")
    val checked = DQEngine.applyChecks(df, rules).collect()
      .map(r => r.getAs[Int]("id") -> r.getSeq[String](r.fieldIndex("_errors")))
      .toMap
    assert(checked(1) == Seq("is_in_range_score"))
    assert(checked(2) == Seq("is_not_null_name"))
  }

  test("warn criticality does not gate") {
    val df = Seq((1, 99.0, "a")).toDF("id", "score", "name")
    val checked = DQEngine.applyChecks(df,
      Seq(IsInRange("score", -5, 5, criticality = "warn")))
    assert(checked.filter(size($"_warnings") > 0).count() == 1)
    DQEngine.gate(checked) // must not throw
  }
}
