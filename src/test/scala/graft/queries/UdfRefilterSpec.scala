package graft.queries

import graft.SparkSpec

/** Catalog-wide UDF-refilter invariant — the fifth sweep-style check
  * (after [[JoinShapeSpec]], [[ScalingSpec]], [[ScanPruningSpec]],
  * [[ShuffleBudgetSpec]]): no query's physical plan may contain an
  * `IsNotNull` predicate wrapping a ScalaUDF or one of the library's
  * native Catalyst expressions (`graft.*` — as expensive per row as the
  * UDFs they replaced).
  *
  * Why this is a scale invariant and not a style nit: when a NULLABLE
  * UDF output becomes a join or aggregation key, Catalyst's constraint
  * propagation pushes the key's not-null requirement back through the
  * alias into a DATA FILTER at the scan — so the UDF body runs again,
  * per row, purely to decide null-ness. For fingerprint-class UDFs the
  * body IS the operator's dominant cost: d3b's 128-bit SimHash plan
  * carried 12 UDF references instead of 4 (each join side
  * re-fingerprinting the corpus for `isnotnull(sh_hi)` filters) until
  * the UDFs were marked `.asNonNullable()` — measured 2.48 s → 1.54 s
  * (~1.6×) warm best-of-3 at sf1. Codegen subexpression elimination
  * hides part of the repeat, which is why the invariant is on the PLAN,
  * not on wall-clock: the repeat is invisible to every correctness test
  * and to the shuffle budget (result and exchanges identical), and
  * whether it costs 1× or 3× depends on stage boundaries Catalyst may
  * redraw at any time.
  *
  * The fix is always one of two honest declarations: a UDF that never
  * returns null says so with `.asNonNullable()` (the null-in case stays
  * inside the body, e.g. null text → empty-doc fingerprint); a UDF that
  * CAN return null must be materialized (persist / write) before
  * anything keys on its output. There is deliberately no allowlist —
  * a legitimate `isnotnull(udf(...))` has not occurred in 175 queries
  * and would deserve the review this failure forces.
  */
class UdfRefilterSpec extends SparkSpec {

  test("catalog-wide: no constraint-propagated null re-filter of a UDF") {
    val offenders = CatalogPlans.executedPlans
      .flatMap { case (name, plan) =>
        ScanPruning.udfNullRefilters(plan).map(f => s"$name: $f")
      }
    assert(offenders.isEmpty,
      "IsNotNull(UDF) data filters re-evaluate the UDF per row — mark " +
        "never-null UDFs .asNonNullable() or materialize before keying:\n  " +
        offenders.mkString("\n  "))
  }
}
