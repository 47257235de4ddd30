package graft.semantic

import scala.collection.mutable

/** Declarative (data, not code) authoring surface for [[MetricView]].
  *
  * Parses the reference's metric-view document shape — the YAML body of
  * `CREATE VIEW ... WITH METRICS LANGUAGE YAML`
  * (`/root/reference/src/notebooks/modelling/semantic_layer.sql:7-94`):
  * scalar keys `version` / `comment` / `source` / `filter`, and block
  * sequences `joins` (name / source / on / optional type), `dimensions`
  * (name / expr / display_name / comment) and `measures` (name / expr /
  * display_name / comment, plus our `sql_expr` dialect-split extension for
  * oracle SQL generation — see [[Measure.sqlExpr]]).
  *
  * This is a hand-rolled parser for exactly that subset (this environment
  * adds no YAML dependency): two-space-nested keys, `- ` list items,
  * single/double-quoted or bare scalars, `#` full-line comments, blank
  * lines. It is NOT a general YAML parser and fails loudly on anything
  * outside the document shape rather than guessing.
  *
  * A dimension's backing join is inferred the way the reference's layer
  * resolves it: from the `<join name>.` references inside `expr`
  * (`semantic_layer.sql:33-76` carry no explicit join field). An expr
  * referencing two different joins has no [[Dimension.join]] encoding and
  * is rejected loudly.
  */
object MetricViewYaml {

  /** Databricks-widget-style template substitution: every `${name}` in the
    * document is replaced from `vars` BEFORE parsing — the reference's
    * documents carry `${catalog}.${environment}.` table prefixes
    * (`semantic_layer.sql:7,13,15-30`) resolved by the notebook runtime.
    * An unresolved placeholder fails loudly: executing a view against a
    * literal `${catalog}` table name would fail later and worse.
    */
  def substitute(doc: String, vars: Map[String, String]): String = {
    val out = vars.foldLeft(doc) { case (acc, (k, v)) =>
      acc.replace("$" + "{" + k + "}", v)
    }
    val leftover = "\\$\\{[^}]*\\}".r.findFirstIn(out)
    require(leftover.isEmpty,
      s"metric-view document: unresolved template variable ${leftover.get} " +
        s"(provided: ${vars.keys.toSeq.sorted.mkString(", ")})")
    out
  }

  /** Parse after substituting `${var}` placeholders from `vars`. */
  def parse(doc: String, vars: Map[String, String]): MetricView =
    parse(substitute(doc, vars))

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 &&
      ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  private val KeyVal = "^([A-Za-z_][A-Za-z0-9_]*):(.*)$".r

  def parse(doc: String): MetricView = {
    val raw = doc.split("\n").toIndexedSeq
      .map(_.replaceAll("\\s+$", ""))
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
    require(raw.nonEmpty, "empty metric-view document")
    val base = raw.map(_.takeWhile(_ == ' ').length).min

    val scalars = mutable.Map.empty[String, String]
    val sections = mutable.Map.empty[String, mutable.Buffer[mutable.Map[String, String]]]
    var section: Option[String] = None

    raw.foreach { line =>
      val indent = line.takeWhile(_ == ' ').length
      val body = line.trim
      if (indent == base) {
        body match {
          case KeyVal(k, v) =>
            if (v.trim.isEmpty) {
              section = Some(k)
              sections.getOrElseUpdate(k, mutable.Buffer.empty)
            } else {
              section = None
              scalars(k) = unquote(v)
            }
          case _ =>
            throw new IllegalArgumentException(
              s"metric-view document: expected 'key: value' at top level, got: $body")
        }
      } else if (body.startsWith("- ")) {
        val sec = section.getOrElse(throw new IllegalArgumentException(
          s"metric-view document: list item outside a section: $body"))
        val item = mutable.Map.empty[String, String]
        body.drop(2).trim match {
          case KeyVal(k, v) => item(k) = unquote(v)
          case other => throw new IllegalArgumentException(
            s"metric-view document: expected '- key: value', got: - $other")
        }
        sections(sec) += item
      } else {
        body match {
          case KeyVal(k, v) =>
            val sec = section.getOrElse(throw new IllegalArgumentException(
              s"metric-view document: nested key outside a section: $body"))
            val items = sections(sec)
            require(items.nonEmpty,
              s"metric-view document: '$k' before any '- ' item in $sec")
            items.last(k) = unquote(v)
          case _ =>
            throw new IllegalArgumentException(
              s"metric-view document: unparseable line: $body")
        }
      }
    }

    def need(item: mutable.Map[String, String], sec: String,
             key: String): String =
      item.getOrElse(key, throw new IllegalArgumentException(
        s"metric-view document: $sec item missing '$key' (${item.keys.mkString(", ")})"))

    val joins = sections.getOrElse("joins", mutable.Buffer.empty).toSeq.map {
      j =>
        MetricJoin(
          name = need(j, "joins", "name"),
          table = need(j, "joins", "source"),
          condition = need(j, "joins", "on"),
          joinType = j.getOrElse("type", "left"))
    }
    val joinNames = joins.map(_.name)

    def inferJoin(name: String, expr: String): Option[String] = {
      val refs = joinNames.filter(jn => expr.contains(jn + "."))
      require(refs.size <= 1,
        s"dimension '$name' references multiple joins (${refs.mkString(", ")}) " +
          "— one backing join per dimension")
      refs.headOption
    }

    val dims = sections.getOrElse("dimensions", mutable.Buffer.empty).toSeq
      .map { d =>
        val name = need(d, "dimensions", "name")
        val expr = need(d, "dimensions", "expr")
        Dimension(name, expr, join = inferJoin(name, expr),
          displayName = d.get("display_name"), comment = d.get("comment"))
      }
    val meas = sections.getOrElse("measures", mutable.Buffer.empty).toSeq
      .map { m =>
        Measure(need(m, "measures", "name"), need(m, "measures", "expr"),
          sqlExpr = m.get("sql_expr"),
          displayName = m.get("display_name"), comment = m.get("comment"))
      }

    MetricView(
      source = scalars.getOrElse("source", throw new IllegalArgumentException(
        "metric-view document: missing 'source'")),
      filter = scalars.get("filter"),
      joins = joins,
      dimensions = dims,
      measures = meas,
      version = scalars.get("version"),
      comment = scalars.get("comment"))
  }
}
