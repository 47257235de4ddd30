package graft.semantic

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Generative render→parse roundtrip for the metric-view YAML parser:
  * a random view model rendered under random ACCEPTED formatting — quote
  * style per value, a uniform base-indent offset, interleaved full-line
  * comments and blank lines, optional fields present or absent, sections
  * in random order — must parse back to exactly the model, join inference
  * included. The fixture specs pin the reference document and the loud
  * failures; this pins that no accepted formatting variation changes the
  * parsed semantics (the quiet corruption a hand-rolled parser risks).
  * Pure driver-side — no Spark session.
  */
class MetricViewYamlPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(30)

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_'))
  } yield (h :: t).mkString

  // values safe under every quote style we render with
  private val scalarVal: Gen[String] = Gen.oneOf(
    "plain", "with space", "a:b", "sum(x) / 2", "src.v * 1.5", "#notcomment")

  private final case class Fmt(extraIndent: Int, quote: Int,
                               comments: Boolean)
  private val fmtGen: Gen[Fmt] = for {
    ind <- Gen.oneOf(0, 2)
    q <- Gen.choose(0, 2) // 0 bare, 1 single, 2 double
    cm <- Gen.oneOf(true, false)
  } yield Fmt(ind, q, cm)

  private def q(v: String, style: Int): String = style match {
    case 1 => s"'$v'"
    case 2 => "\"" + v + "\""
    case _ => v
  }

  private val viewGen: Gen[MetricView] = for {
    source <- ident.map(s => s"cat.schema.$s")
    filter <- Gen.option(scalarVal)
    version <- Gen.option(Gen.oneOf("0.1", "1"))
    comment <- Gen.option(scalarVal)
    nJoins <- Gen.choose(0, 2)
    joins <- Gen.listOfN(nJoins, for {
      n <- ident; t <- ident
      typ <- Gen.option(Gen.oneOf("left", "inner"))
    } yield MetricJoin(s"j_$n", s"cat.schema.$t", s"src.k = j_$n.k",
      typ.getOrElse("left")))
    dims <- Gen.listOfN(2, for {
      n <- ident
      useJoin <- Gen.oneOf(true, false)
      dn <- Gen.option(scalarVal)
      cm <- Gen.option(scalarVal)
    } yield {
      val jn = if (useJoin && joins.nonEmpty) Some(joins.head.name) else None
      Dimension(s"d_$n", jn.fold(s"src.$n")(j => s"$j.$n"),
        join = jn, displayName = dn, comment = cm)
    })
    meas <- Gen.listOfN(2, for {
      n <- ident
      sq <- Gen.option(Gen.const(s"sum($n)"))
      dn <- Gen.option(scalarVal)
    } yield Measure(s"m_$n", s"sum(src.$n)", sqlExpr = sq,
      displayName = dn, comment = None))
  } yield MetricView(source, filter, joins, dims, meas, version, comment)

  private def render(v: MetricView, fmt: Fmt): String = {
    val pad = " " * fmt.extraIndent
    val b = scala.collection.mutable.Buffer.empty[String]
    def cmt(): Unit = if (fmt.comments) { b += "# generated"; b += "" }
    cmt()
    v.version.foreach(x => b += s"${pad}version: ${q(x, fmt.quote)}")
    b += s"${pad}source: ${q(v.source, fmt.quote)}"
    v.filter.foreach(x => b += s"${pad}filter: ${q(x, fmt.quote)}")
    v.comment.foreach(x => b += s"${pad}comment: ${q(x, fmt.quote)}")
    if (v.joins.nonEmpty) {
      b += s"${pad}joins:"
      v.joins.foreach { j =>
        cmt()
        b += s"$pad  - name: ${j.name}"
        b += s"$pad    source: ${q(j.table, fmt.quote)}"
        b += s"$pad    on: ${q(j.condition, fmt.quote)}"
        if (j.joinType != "left") b += s"$pad    type: ${j.joinType}"
      }
    }
    if (v.dimensions.nonEmpty) {
      b += s"${pad}dimensions:"
      v.dimensions.foreach { d =>
        b += s"$pad  - name: ${d.name}"
        b += s"$pad    expr: ${q(d.expression, fmt.quote)}"
        d.displayName.foreach(x => b += s"$pad    display_name: ${q(x, fmt.quote)}")
        d.comment.foreach(x => b += s"$pad    comment: ${q(x, fmt.quote)}")
      }
    }
    if (v.measures.nonEmpty) {
      b += s"${pad}measures:"
      v.measures.foreach { m =>
        cmt()
        b += s"$pad  - name: ${m.name}"
        b += s"$pad    expr: ${q(m.expression, fmt.quote)}"
        m.sqlExpr.foreach(x => b += s"$pad    sql_expr: ${q(x, fmt.quote)}")
        m.displayName.foreach(x => b += s"$pad    display_name: ${q(x, fmt.quote)}")
      }
    }
    b.mkString("\n")
  }

  test("random views roundtrip through render → parse, formatting-invariant") {
    val prop = Prop.forAll(viewGen, fmtGen) { (view, fmt) =>
      // a default-typed join renders without its `type` line; parsing fills
      // the default back in, so the model IS the expected parse
      MetricViewYaml.parse(render(view, fmt)) == view
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("the same document parses identically with and without an indent offset") {
    val prop = Prop.forAll(viewGen) { view =>
      MetricViewYaml.parse(render(view, Fmt(0, 0, comments = false))) ==
        MetricViewYaml.parse(render(view, Fmt(2, 1, comments = true)))
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
