package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench output contract: the harness stores only the last ~2000 chars of
  * stdout and parses the LAST line as JSON (BENCH_r01/r02 both came back
  * `parsed:null` before this was pinned down). These tests lock the
  * rendered line to that budget for the real catalog size.
  */
class BenchFormatSpec extends AnyFunSuite {

  private def realisticResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map { case (n, i) =>
      n -> (0.05 + (i % 30) * 0.11) // realistic sub-4s spread
    }

  test("rendered line fits the harness tail buffer; slow queries survive") {
    val results = realisticResults
    val line = Bench.renderLine(results, "sf0.1")
    assert(line.length <= 1900, s"line is ${line.length} chars")
    // Dropping fastest-first is acceptable, but the 30 SLOWEST queries
    // (what a judge actually reads) must survive any dropping. (The
    // catalog has outgrown "every ≥1s query fits": 110 entries at ~20
    // chars each exceed the ~1900-char harness tail budget, so the
    // fastest tail is exactly what the drop rule is for.)
    results.sortBy(-_._2).take(30).foreach { case (n, _) =>
      assert(line.contains(s""""$n":"""), s"slow query $n missing from line")
    }
  }

  test("line starts with the driver contract prefix and ends with sf") {
    val line = Bench.renderLine(realisticResults, "sf0.1")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf0.1"}"""))
  }

  test("pathological times still fit by dropping fastest queries") {
    val slow = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map {
      case (n, i) => n -> (100.0 + i * 13.37)
    }
    val line = Bench.renderLine(slow, "sf0.1")
    assert(line.length <= 1900, s"line is ${line.length} chars")
    // The slowest query must survive any dropping.
    val slowest = slow.maxBy(_._2)._1
    assert(line.contains(s""""$slowest":"""))
  }

  test("renderFull keeps every query, parses as JSON-shaped, matches line total") {
    val results = realisticResults
    val full = Bench.renderFull(results, "sf0.1")
    results.foreach { case (n, _) =>
      assert(full.contains(s""""$n":"""), s"$n missing from full map")
    }
    assert(full.startsWith("""{"metric":"total","value":"""))
    assert(full.endsWith(""","sf":"sf0.1"}"""))
    // same total as the capped stdout line — one source of truth
    val line = Bench.renderLine(results, "sf0.1")
    val totalOf = (s: String) => s.split(""""value":""")(1).split(",")(0)
    assert(totalOf(full) == totalOf(line))
  }

  test("renderDetail carries all shots and the per-query load trace; " +
    "composes with renderFull without breaking the line contract") {
    val shots = Seq(
      "q_fast" -> Seq((0.101, 1.5), (0.099, 1.6)),
      "q_jitter" -> Seq((0.3, 1.75), (0.2, 1.8), (0.21, 1.9)), // 3rd pass
      "q_fail" -> Seq((-1.0, 2.25), (2.0, 2.3)))
    val detail = Bench.renderDetail(shots)
    assert(detail.contains(
      """"shots":{"q_fast":[0.101,0.099],"q_jitter":[0.300,0.200,0.210],"q_fail":[-1,2.000]}"""),
      detail)
    assert(detail.contains(
      """"loads":{"q_fast":[1.500,1.600],"q_jitter":[1.750,1.800,1.900],"q_fail":[2.250,2.300]}"""),
      detail)
    // as the full artifact's extra: still one JSON object ending in sf
    val results = shots.map { case (n, rs) => n -> Bench.best(rs.map(_._1)) }
    assert(results.toMap.apply("q_jitter") == 0.2)
    assert(results.toMap.apply("q_fail") == 2.0) // one good shot survives
    assert(Bench.best(Seq(-1.0, -1.0)) == -1.0) // all-fail keeps the marker
    val full = Bench.renderFull(results, "sf0.1",
      extra = ""","load":[1.5,2.25]""" + detail)
    assert(full.endsWith(""","sf":"sf0.1"}"""), full)
    assert(full.contains(""""shots":"""), full)
    // detail stays OUT of the stdout line: its budget is for timings
    val line = Bench.renderLine(results, "sf0.1")
    assert(!line.contains("shots"), line)
  }

  test("the volatile class names real catalog queries, and the " +
    "artifact's volatile field renders as a JSON string array") {
    // membership rot check: a renamed/removed query would silently
    // un-de-noise itself — the set must stay inside the live catalog
    Bench.volatileClass.foreach { n =>
      assert(SparkEntry.queries.contains(n),
        s"volatileClass entry $n is not a catalog query")
    }
    // the extra section shape Bench.main renders (schema growth is
    // append-only for consumers: load, calib, tcalib, volatile, then
    // detail — bench_diff treats calib/tcalib as optional so old
    // artifacts keep diffing)
    val volat = Bench.volatileClass.toSeq.sorted
      .map(n => s""""$n"""").mkString("[", ",", "]")
    val full = Bench.renderFull(Seq("q_a" -> 0.1), "sf0.1",
      extra = s""","load":[1.5,2.25],"calib":[0.88],""" +
        s""""tcalib":[1.02],"volatile":$volat""")
    assert(full.contains(""""volatile":["""), full)
    assert(full.contains(""""tcalib":["""), full)
    assert(full.endsWith(""","sf":"sf0.1"}"""), full)
  }

  test("the throughput probe does fixed work and returns a plausible " +
    "wall time") {
    Bench.tcalibrate() // JIT + data fill, untimed
    val t = Bench.tcalibrate()
    // Bounds are deliberately loose — this pins "real parallel work
    // happened" (not DCE'd to nothing, not accidentally minutes-long),
    // not a host-speed number. ~1 s/call measured idle on this box.
    assert(t > 0.05, s"throughput probe finished implausibly fast: $t s")
    assert(t < 30.0, s"throughput probe implausibly slow: $t s")
  }

  test("fmt keeps ms precision under 10s and stays short above") {
    assert(Bench.fmt(0.123456) == "0.123")
    assert(Bench.fmt(12.3456) == "12.35")
    assert(Bench.fmt(123.456) == "123.5")
    assert(Bench.fmt(-1.0) == "-1")
  }

  test("a failed query (-1 marker) is never dropped from an overflowing line") {
    val results = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map {
      case (n, i) => n -> (100.0 + i) // force overflow → drops happen
    }
    val failedName = results(results.length / 2)._1
    val withFailure = results.map { case (n, v) =>
      n -> (if (n == failedName) -1.0 else v)
    }
    val line = Bench.renderLine(withFailure, "sf0.1")
    assert(line.contains(s""""$failedName":-1"""), line)
  }
}
