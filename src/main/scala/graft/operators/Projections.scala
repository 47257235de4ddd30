package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Dynamic projection helpers (SURVEY.md §2 P2): the reference's
  * games-dimension projection strips materialization prefixes from column
  * names when publishing the dim
  * (`/root/reference/src/notebooks/modelling/auxillary_dims.py:136-148`).
  * Generalized here as a schema-driven rename — one projection node, no
  * data movement.
  */
object Projections {

  /** Strip `prefix` from every column name that carries it (other columns
    * pass through untouched). Fails fast if stripping would collide with an
    * existing column name.
    */
  def stripPrefix(df: DataFrame, prefix: String): DataFrame = {
    val renamed = df.columns.map(c =>
      if (c.startsWith(prefix)) c.stripPrefix(prefix) else c)
    require(renamed.distinct.length == renamed.length,
      s"stripping '$prefix' collides: ${renamed.mkString(", ")}")
    df.select(df.columns.zip(renamed).map { case (from, to) =>
      col(from).as(to)
    }.toIndexedSeq: _*)
  }
}
