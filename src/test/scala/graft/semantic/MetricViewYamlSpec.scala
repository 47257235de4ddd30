package graft.semantic

import org.scalatest.funsuite.AnyFunSuite

/** The declarative (YAML-document) authoring surface: the embedded
  * harness document must parse to exactly the code-authored view, and the
  * parser must fail loudly outside the reference's document shape.
  */
class MetricViewYamlSpec extends AnyFunSuite {

  test("the harness document parses to exactly the code-authored view") {
    val parsed = MetricViewYaml.parse(graft.queries.SemanticQueries.lineitemViewYaml)
    assert(parsed == graft.queries.SemanticQueries.lineitemView)
  }

  test("the parsed view generates identical SQL for every metric request") {
    val parsed = MetricViewYaml.parse(graft.queries.SemanticQueries.lineitemViewYaml)
    val code = graft.queries.SemanticQueries.lineitemView
    val req = (Seq("line_count", "median_quantity"), Seq("order_status", "ship_year"))
    assert(parsed.toSql(req._1, req._2) == code.toSql(req._1, req._2))
    assert(parsed.toSql(req._1, req._2, oracle = false)
      == code.toSql(req._1, req._2, oracle = false))
  }

  test("join inference: source-only exprs get no join, multi-join exprs fail") {
    val doc =
      """source: f
        |joins:
        |  - name: a
        |    source: ta
        |    on: source.k = a.k
        |  - name: b
        |    source: tb
        |    on: source.k = b.k
        |dimensions:
        |  - name: plain
        |    expr: source.x
        |  - name: via_a
        |    expr: upper(a.name)
        |measures:
        |  - name: n
        |    expr: COUNT(*)
        |""".stripMargin
    val v = MetricViewYaml.parse(doc)
    assert(v.dimensions.find(_.name == "plain").get.join.isEmpty)
    assert(v.dimensions.find(_.name == "via_a").get.join.contains("a"))
    val bad = doc.replace("expr: upper(a.name)", "expr: concat(a.name, b.name)")
    val ex = intercept[IllegalArgumentException](MetricViewYaml.parse(bad))
    assert(ex.getMessage.contains("multiple joins"))
  }

  test("quoting, comments, blank lines, and join type are honored") {
    val doc =
      """# a full-line comment
        |version: 1.1
        |comment: "KPIs"
        |source: fact
        |
        |filter: 'x IS NOT NULL'
        |joins:
        |  - name: d
        |    source: dimt
        |    on: source.k = d.k
        |    type: inner
        |dimensions:
        |  - name: dn
        |    expr: d.name
        |    display_name: 'Display'
        |measures:
        |  - name: n
        |    expr: COUNT(*)
        |""".stripMargin
    val v = MetricViewYaml.parse(doc)
    assert(v.filter.contains("x IS NOT NULL"))
    assert(v.joins == Seq(MetricJoin("d", "dimt", "source.k = d.k", "inner")))
    assert(v.dimensions == Seq(Dimension("dn", "d.name", join = Some("d"),
      displayName = Some("Display"))))
    assert(v.version.contains("1.1") && v.comment.contains("KPIs"))
  }

  test("the reference's verbatim document parses completely") {
    val v = MetricViewYaml.parse(ReviewMetrics.yamlDocument,
      Map("catalog" -> "cat", "environment" -> "env"))
    assert(v.source == "cat.env.fact_reviews")
    assert(v.filter.contains("weighted_score IS NOT NULL"))
    assert(v.version.contains("1.1") && v.comment.contains("KPIs for Reviews"))
    assert(v.joins.map(_.name) == Seq("dim_games", "dim_categories",
      "dim_genres", "dim_publishers", "dim_developers"))
    assert(v.joins.forall(_.joinType == "left"))
    assert(v.joins.find(_.name == "dim_genres").get.table == "cat.env.dim_genres")
    assert(v.dimensions.size == 11 && v.measures.size == 5)
    // display_name / comment metadata is captured, not dropped
    val rel = v.dimensions.find(_.name == "release_date").get
    assert(rel.displayName.contains("Release Date")
      && rel.comment.contains("Release Date of the Game")
      && rel.join.contains("dim_games"))
    assert(v.dimensions.find(_.name == "review_date").get.join.isEmpty)
    val pct = v.measures.find(_.name == "positive_review_pct").get
    assert(pct.expression ==
      "SUM(CASE WHEN weighted_score > 0 THEN 1 ELSE 0 END) / COUNT(*)")
    assert(pct.displayName.contains("Postive Review Percentage"))
    assert(v.measures.find(_.name == "median_review_length").get
      .expression == "PERCENTILE(LENGTH(review_text), 0.5)")
  }

  test("unresolved template variables fail loudly") {
    val ex = intercept[IllegalArgumentException] {
      MetricViewYaml.parse(ReviewMetrics.yamlDocument,
        Map("catalog" -> "cat"))
    }
    assert(ex.getMessage.contains("unresolved template variable"))
  }

  test("malformed documents fail loudly, not silently") {
    intercept[IllegalArgumentException](MetricViewYaml.parse(""))
    intercept[IllegalArgumentException](
      MetricViewYaml.parse("joins:\n  - name: j\n"))   // missing source
    intercept[IllegalArgumentException](
      MetricViewYaml.parse("source: f\nmeasures:\n  - expr: COUNT(*)\n")
    ) // item missing name
    intercept[IllegalArgumentException](
      MetricViewYaml.parse("source: f\n  stray_nested: 1\n"))
  }
}
