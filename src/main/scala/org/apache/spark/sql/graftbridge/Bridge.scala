package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the standard extension-point shim for libraries that register native
  * Catalyst expressions (Spark 4 removed the public `Column.expr` /
  * `new Column(expr)` surface).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans — the
    * signal the cache-leak sweep needs ([[graft]]'s persist discipline:
    * an operator that `.persist()`s during construction must either
    * unpersist before returning or document the cache as part of its
    * contract). `DataFrame.persist` REGISTERS in the CacheManager
    * eagerly (materialization is lazy), so this is a plan-time check —
    * no public Catalog API exposes "anything cached?", hence the
    * bridge.
    */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
