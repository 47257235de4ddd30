package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types.DecimalType

/** Whole-catalog invariants: every query plans against the harness tables,
  * the DECIMAL→DOUBLE output contract holds for all of them (the driver
  * hash canonicalizes fixed-scale decimals differently from doubles), and
  * the oracle map stays in lockstep with the query map.
  */
class CatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every catalog query builds and emits no DECIMAL output column") {
    graft.SparkEntry.queries.foreach { case (name, q) =>
      val schema = q(spark, sf).schema
      // Recursive: a DECIMAL nested in a struct/array/map output would hit
      // the driver hash just like a top-level one.
      val decimals = schema.filter(f => QueryUtil.containsDecimal(f.dataType))
      assert(decimals.isEmpty,
        s"$name leaks DECIMAL at the boundary: ${decimals.map(_.name)}")
    }
  }

  test("oracle map matches the query map exactly — every query has an oracle") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }
}
