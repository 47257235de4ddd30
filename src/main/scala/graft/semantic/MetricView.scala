package graft.semantic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Declarative semantic metric layer.
  *
  * Re-expresses the reference's Databricks `CREATE VIEW ... WITH METRICS
  * LANGUAGE YAML` view (`/root/reference/src/notebooks/modelling/
  * semantic_layer.sql:7-94`): a model of source + filter + joins +
  * dimensions + measures that compiles (measures, dimensions) requests into
  * DataFrame plans. The expansion Databricks does server-side (SURVEY.md
  * §3.3) is what `query`/`toSql` do here; parsing, optimization and
  * execution stay 100% Catalyst.
  *
  * Join pruning (SURVEY.md §4): only joins referenced by the requested
  * dimensions are included, so "avg score by genre" never pays the other
  * four dim joins. Joins are declared over catalog/temp-view names, which
  * keeps `query` (Spark) and `toSql` (any ANSI engine, e.g. the DuckDB
  * oracle) reading the same tables.
  *
  * Scale: dim joins in a star schema are broadcast-eligible (small dims);
  * the grouped aggregate is partial+final hash agg — no extra shuffles
  * beyond the one groupBy.
  */
final case class MetricJoin(
    name: String,      // alias, referenced by dimension exprs
    table: String,     // catalog / temp-view table name
    condition: String, // SQL, e.g. "source.appid = genres.appid"
    joinType: String = "left"
)

/** `join = None` → expression over the source; `sqlExpr` overrides the
  * expression used in generated SQL when the oracle dialect differs
  * (e.g. Spark `percentile` vs DuckDB `quantile_cont`). `displayName` /
  * `comment` are the document's catalog-facing metadata
  * (`semantic_layer.sql:34-35` et al.) — carried for catalog surfaces,
  * never touched by compilation.
  */
final case class Dimension(name: String, expression: String,
                           join: Option[String] = None,
                           displayName: Option[String] = None,
                           comment: Option[String] = None)

final case class Measure(name: String, expression: String,
                         sqlExpr: Option[String] = None,
                         displayName: Option[String] = None,
                         comment: Option[String] = None)

/** `version` / `comment` mirror the document header
  * (`semantic_layer.sql:11-12`) — view-level metadata, not semantics.
  */
final case class MetricView(
    source: String,
    filter: Option[String],
    joins: Seq[MetricJoin],
    dimensions: Seq[Dimension],
    measures: Seq[Measure],
    version: Option[String] = None,
    comment: Option[String] = None
) {

  private def dim(n: String): Dimension =
    dimensions.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown dimension: $n"))

  private def measure(n: String): Measure =
    measures.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown measure: $n"))

  /** Joins needed by the requested dimensions, in declaration order. */
  private def neededJoins(dimNames: Seq[String]): Seq[MetricJoin] = {
    val wanted = dimNames.map(dim).flatMap(_.join).toSet
    joins.filter(j => wanted.contains(j.name))
  }

  /** Compile a metric request to a DataFrame plan. `having` filters on the
    * aggregated output (measure/dimension aliases are in scope).
    */
  def query(spark: SparkSession, measureNames: Seq[String],
            dimNames: Seq[String] = Nil,
            where: Option[String] = None,
            having: Option[String] = None): DataFrame = {
    val base0 = spark.table(source).alias("source")
    val base = filter.map(f => base0.filter(expr(f))).getOrElse(base0)
    val joined = neededJoins(dimNames).foldLeft(base) { (acc, j) =>
      acc.join(spark.table(j.table).alias(j.name), expr(j.condition), j.joinType)
    }
    val filtered = where.map(w => joined.filter(expr(w))).getOrElse(joined)
    val dimCols = dimNames.map(n => expr(dim(n).expression).as(n))
    // Hoist non-trivial aggregate ARGUMENTS into a projection below the
    // aggregate (r20, guide §1.2): an aggregate child re-evaluates at
    // every reference in its update expressions, so a measure like
    // SUM(CAST(price * (1 - discount) AS DECIMAL(18,4))) pays the
    // product + BigDecimal-allocating cast 2-3× per row inside the agg
    // (measured catalog-wide: ~30-40% of such queries' task CPU). The
    // rewrite lives in THIS compiler, so the code-authored view, the
    // YAML-parsed view (m7's plan-equality pin) and the verbatim
    // reference document (m8) all compile to the same hoisted plan —
    // the measure SQL, the analysts' surface, is untouched. Attribute,
    // star (COUNT(*)) and literal arguments stay in place; everything
    // else is projected once under a synthetic alias.
    val hoisted = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, org.apache.spark.sql.catalyst.expressions.Expression)]
    def rewrite(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = e.transform {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if MetricView.HoistableAggs.contains(
            f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) =>
        val newArgs = f.arguments.map {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a
          case s: org.apache.spark.sql.catalyst.analysis.UnresolvedStar => s
          case l: org.apache.spark.sql.catalyst.expressions.Literal => l
          case c =>
            val (nm, _) = hoisted.getOrElseUpdate(c.sql,
              (s"_mv_h${hoisted.size}", c))
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(nm))
        }
        f.copy(arguments = newArgs)
    }
    // parse with the session parser, not functions.expr: Spark 4's
    // Column wraps a lazy ColumnNode, so Bridge.expression(expr(...))
    // yields an opaque ColumnNodeExpression with no tree to transform
    import org.apache.spark.sql.graftbridge.Bridge
    val parser = spark.sessionState.sqlParser
    val aggCols = measureNames.map(n =>
      Bridge.column(rewrite(parser.parseExpression(measure(n).expression)))
        .as(n))
    val pre =
      if (hoisted.isEmpty) filtered
      else filtered.select(col("*") +: hoisted.values.toSeq.map {
        case (nm, e) => Bridge.column(e).as(nm)
      }: _*)
    val agged =
      if (dimCols.isEmpty) pre.agg(aggCols.head, aggCols.tail: _*)
      else pre.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
    having.map(h => agged.filter(expr(h))).getOrElse(agged)
  }

  /** The expanded SQL for the same request — what Databricks' view layer
    * would emit (SURVEY.md §3.3); also the DuckDB oracle text.
    */
  def toSql(measureNames: Seq[String], dimNames: Seq[String] = Nil,
            where: Option[String] = None, oracle: Boolean = true,
            having: Option[String] = None): String = {
    val needed = neededJoins(dimNames)
    val dimSel = dimNames.map(n => s"${dim(n).expression} AS $n")
    val aggSel = measureNames.map { n =>
      val m = measure(n)
      val e = if (oracle) m.sqlExpr.getOrElse(m.expression) else m.expression
      s"$e AS $n"
    }
    val select = (dimSel ++ aggSel).mkString(", ")
    val joinSql = needed.map { j =>
      val jt = j.joinType.toUpperCase match {
        case "LEFT" => "LEFT JOIN"; case "INNER" => "JOIN"
        case other => s"$other JOIN"
      }
      s" $jt ${j.table} AS ${j.name} ON ${j.condition}"
    }.mkString
    val whereClauses = filter.toSeq ++ where.toSeq
    val whereSql =
      if (whereClauses.isEmpty) ""
      else " WHERE " + whereClauses.map(c => s"($c)").mkString(" AND ")
    val groupSql =
      if (dimNames.isEmpty) ""
      else " GROUP BY " + dimNames.map(dim(_).expression).mkString(", ")
    val havingSql = having.map(h => s" HAVING $h").getOrElse("")
    s"SELECT $select FROM $source AS source$joinSql$whereSql$groupSql$havingSql"
  }

  /** Register the fully-expanded (all dims, all measures) query as a plain
    * SQL view — ≙ `CREATE OR REPLACE VIEW` of `semantic_layer.sql:7`.
    */
  def registerView(spark: SparkSession, viewName: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $viewName AS " +
      toSql(measures.map(_.name), dimensions.map(_.name), oracle = false))
}

object MetricView {
  /** Aggregates whose arguments the measure compiler hoists below the
    * aggregate (see [[MetricView.query]]): the standard algebraic set —
    * for these, AGG(expr) over rows R ≡ AGG(col) over R projected with
    * col = expr, including DISTINCT forms (distinct-of-equal-values is
    * unchanged by naming the expression). percentile and friends keep
    * their arguments in place: theirs are plain attributes in every
    * declared measure, so there is nothing to hoist.
    */
  private[semantic] val HoistableAggs: Set[String] =
    Set("sum", "avg", "min", "max", "count")
}
