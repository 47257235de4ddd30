package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedCountBelowSpec extends SparkSpec {
  import spark.implicits._

  // randomized-but-deterministic sorted cut arrays + probe values hitting
  // every regime: below all, above all, exactly ON a cut (strictness),
  // inside a tie run, NaN probe, NaN-free and infinite endpoints
  private def doubleCases: Seq[(Seq[Double], Double)] = {
    val base = for (i <- 0 until 200) yield {
      val h = (i * 2654435761L) & 0x7fffffffL
      val n = (h % 9 + 1).toInt
      val cuts = Seq.tabulate(n)(j =>
        ((h + j * 31) % 50).toDouble / 7.0).sorted
      val probe = (i % 5) match {
        case 0 => cuts.head - 1.0          // below all
        case 1 => cuts.last + 1.0          // above all
        case 2 => cuts(n / 2)              // exactly on a cut: strictness
        case 3 => Double.NaN               // nan-safe ordering: > all
        case _ => ((h % 71).toDouble / 9.0)
      }
      (cuts, probe)
    }
    base ++ Seq(
      (Seq(1.0, 1.0, 1.0), 1.0),           // all-tie array, probe on tie
      (Seq(1.0, 1.0, 1.0), 2.0),
      (Seq(Double.NegativeInfinity, 0.0, Double.PositiveInfinity), 0.0),
      (Seq(-0.0), 0.0),                    // -0.0 == 0.0 under Spark order
      (Seq(0.0), -0.0))
  }

  test("binary search equals the interpreted filter form, double") {
    val df = doubleCases.toDF("cuts", "v")
    val got = df.select(
      coalesce(SortedCountBelow.sortedCountBelow($"cuts", $"v"), lit(0))
        .as("native"),
      coalesce(size(filter($"cuts", c => $"v" > c)), lit(0)).as("hof"))
      .as[(Int, Int)].collect()
    got.zip(doubleCases).foreach { case ((n, h), (cuts, v)) =>
      assert(n == h, s"cuts=$cuts v=$v native=$n hof=$h")
    }
  }

  test("binary search equals the filter form, bigint (exact, no widening)") {
    // ids past 2^53 would lose precision if compared as double — prove
    // the integral path compares as long
    val big = (1L << 53) + 2L
    val cases = Seq(
      (Seq(1L, 5L, 5L, 9L), 5L),
      (Seq(1L, 5L, 5L, 9L), 6L),
      (Seq(big - 1L, big, big + 1L), big),
      (Seq(Long.MinValue, 0L, Long.MaxValue), -1L))
    val df = cases.toDF("cuts", "v")
    val got = df.select(
      SortedCountBelow.sortedCountBelow($"cuts", $"v").as("native"),
      size(filter($"cuts", c => $"v" > c)).as("hof"))
      .as[(Int, Int)].collect()
    got.zip(cases).foreach { case ((n, h), (cuts, v)) =>
      assert(n == h, s"cuts=$cuts v=$v native=$n hof=$h")
    }
  }

  test("null array or null value yields null; coalesce gives band 0") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Double]),
      (None: Option[Seq[Double]], Some(1.0)))
      .toDF("cuts", "v")
    val out = df.select(
      SortedCountBelow.sortedCountBelow($"cuts", $"v").as("raw"),
      coalesce(SortedCountBelow.sortedCountBelow($"cuts", $"v"), lit(0))
        .as("band")).collect()
    assert(out.forall(_.isNullAt(0)) && out.forall(_.getInt(1) == 0))
  }

  test("nullable-ELEMENT arrays keep filter-form semantics: null " +
    "elements count as not-below (linear path, chosen at plan time)") {
    // Seq[Option[Double]] encodes as array<double> containsNull=true —
    // the shape percentile_approx never emits but public callers build
    // via array(...)/transform/from_json. The filter form DROPS null
    // elements; the nullable linear path must match it exactly.
    val cases = Seq(
      (Seq(Option(1.0), None, Option(3.0)), 2.0), // null mid-array
      (Seq(None: Option[Double], None), 5.0), // all-null
      (Seq(Option(1.0), Option(2.0)), 2.0), // no actual nulls
      (Seq(Option(Double.NaN), None, Option(0.0)), 1.0)) // NaN + null
    val df = cases.toDF("cuts", "v")
    val got = df.select(
      coalesce(SortedCountBelow.sortedCountBelow($"cuts", $"v"), lit(-1))
        .as("native"),
      coalesce(size(filter($"cuts", c => $"v" > c)), lit(-1)).as("hof"))
      .as[(Int, Int)].collect()
    got.zip(cases).foreach { case ((n, h), (cuts, v)) =>
      assert(n == h, s"cuts=$cuts v=$v native=$n hof=$h")
    }
  }

  test("type mismatch is rejected at analysis, not silently coerced") {
    val df = Seq((Seq(1.0, 2.0), 1L)).toDF("cuts", "v")
    val ex = intercept[Exception] {
      df.select(SortedCountBelow.sortedCountBelow($"cuts", $"v")).collect()
    }
    assert(ex.getMessage.contains("sorted_count_below"))
  }

  test("fuses into whole-stage codegen (no interpreted-HOF stage break)") {
    // repartition defeats ConvertToLocalRelation, which would otherwise
    // fold the whole projection into a LocalTableScan at plan time
    val df = doubleCases.toDF("cuts", "v").repartition(2)
      .select(SortedCountBelow.sortedCountBelow($"cuts", $"v").as("b"))
      .filter($"b" >= 0)
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen marker in the compact
    // rendering; the projection computing the band must carry it (an
    // interpreted HOF there would print an unstarred Project)
    assert("""\*\(\d+\) Project \[sortedcountbelow""".r
      .findFirstIn(plan).isDefined, plan)
  }
}
