package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ai.{AiFunctions, DeterministicRubricScorer, DictionaryTranslator}
import graft.quality._
import graft.semantic.{Dimension, Measure, MetricJoin, MetricView, MetricViewYaml}
import QueryUtil._

/** Oracle-checked queries for the reference's non-relational surface:
  * AI functions (U1/U2), the DQ rule engine (U3) and the semantic metric
  * layer (K3/J5/A1-A5) — SURVEY.md §2.9, §2.1, §3.3 — instantiated over the
  * harness star schema.
  */
object SemanticQueries {

  /** Rubric keywords tuned to the harness `documents` vocabulary so scores
    * are spread across all buckets; the CASE chain is mirrored 1:1 in the
    * oracle SQL.
    */
  private val scorer = DeterministicRubricScorer(
    strongPos = Seq("fast"), strongNeg = Seq("slow"),
    mildPos = Seq("merge"), mildNeg = Seq("batch"))

  private val translator = DictionaryTranslator(Map(
    "en" -> "English", "de" -> "German", "fr" -> "French", "es" -> "Spanish"))

  private def registerAi(s: SparkSession): Unit =
    AiFunctions.register(s, scorer, translator)

  /** Harness star metric view: lineitem fact + orders/part/supplier dims.
    * Mirrors the shape of `semantic_layer.sql:7-94` (source + filter +
    * joins + dimensions + measures, the five reference measure archetypes
    * A1-A5).
    */
  val lineitemView: MetricView = MetricView(
    source = "lineitem",
    filter = Some("l_quantity IS NOT NULL"),
    joins = Seq(
      MetricJoin("ord", "orders", "source.l_orderkey = ord.o_orderkey"),
      MetricJoin("prt", "part", "source.l_partkey = prt.p_partkey"),
      MetricJoin("sup", "supplier", "source.l_suppkey = sup.s_suppkey")),
    dimensions = Seq(
      Dimension("return_flag", "source.l_returnflag"),
      Dimension("ship_year", "CAST(year(source.l_shipdate) AS INTEGER)"),
      Dimension("brand", "prt.p_brand", join = Some("prt")),
      Dimension("order_status", "ord.o_orderstatus", join = Some("ord")),
      Dimension("supplier_name", "sup.s_name", join = Some("sup"))),
    measures = Seq(
      // A1 review_count archetype
      Measure("line_count", "CAST(COUNT(*) AS BIGINT)"),
      // A2 avg archetype (quantities are integer-valued: exact in double)
      Measure("avg_quantity", "AVG(source.l_quantity)"),
      // decimal arithmetic internal, DOUBLE at the boundary (hash parity —
      // see QueryUtil.finalizeDecimals)
      Measure("sum_revenue",
        "CAST(CAST(SUM(CAST(source.l_extendedprice * (1 - source.l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)"),
      // A3/A4 pct archetype
      Measure("discounted_pct",
        "CAST(CAST(CAST(SUM(CASE WHEN source.l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)"),
      // A5 exact-percentile archetype (dialect differs: percentile vs
      // quantile_cont)
      Measure("median_quantity",
        "CAST(CAST(percentile(source.l_quantity, 0.5) AS DECIMAL(18,4)) AS DOUBLE)",
        sqlExpr = Some("CAST(CAST(quantile_cont(source.l_quantity, 0.5) AS DECIMAL(18,4)) AS DOUBLE)"))))

  /** The SAME view authored as DATA — the reference's analyst surface
    * (`semantic_layer.sql:7-94` is a YAML document, not code). Parsed by
    * [[MetricViewYaml]]; `MetricViewYamlSpec` asserts it parses to exactly
    * [[lineitemView]], and `m7` proves the compiled plans hash-match.
    */
  val lineitemViewYaml: String =
    """version: 1.1
      |comment: "KPIs for harness lineitems"
      |source: lineitem
      |filter: l_quantity IS NOT NULL
      |joins:
      |  - name: ord
      |    source: orders
      |    on: source.l_orderkey = ord.o_orderkey
      |  - name: prt
      |    source: part
      |    on: source.l_partkey = prt.p_partkey
      |  - name: sup
      |    source: supplier
      |    on: source.l_suppkey = sup.s_suppkey
      |dimensions:
      |  - name: return_flag
      |    expr: source.l_returnflag
      |    display_name: 'Return Flag'
      |    comment: 'Lineitem return flag'
      |  - name: ship_year
      |    expr: CAST(year(source.l_shipdate) AS INTEGER)
      |  - name: brand
      |    expr: prt.p_brand
      |    display_name: 'Part Brand'
      |  - name: order_status
      |    expr: ord.o_orderstatus
      |  - name: supplier_name
      |    expr: sup.s_name
      |measures:
      |  - name: line_count
      |    expr: CAST(COUNT(*) AS BIGINT)
      |  - name: avg_quantity
      |    expr: AVG(source.l_quantity)
      |    display_name: 'Average Quantity'
      |  - name: sum_revenue
      |    expr: CAST(CAST(SUM(CAST(source.l_extendedprice * (1 - source.l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
      |  - name: discounted_pct
      |    expr: CAST(CAST(CAST(SUM(CASE WHEN source.l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
      |  - name: median_quantity
      |    expr: CAST(CAST(percentile(source.l_quantity, 0.5) AS DECIMAL(18,4)) AS DOUBLE)
      |    sql_expr: CAST(CAST(quantile_cont(source.l_quantity, 0.5) AS DECIMAL(18,4)) AS DOUBLE)
      |""".stripMargin

  /** Fan-out view: orders source × 1:many lineitem join — reproduces the
    * reference's intentional fact-fan-out grain (SURVEY.md §7.4.3,
    * `semantic_layer.sql:15-30`): an order's totalprice is counted once per
    * matching line.
    */
  val ordersFanoutView: MetricView = MetricView(
    source = "orders",
    filter = None,
    joins = Seq(
      MetricJoin("li", "lineitem", "source.o_orderkey = li.l_orderkey")),
    dimensions = Seq(
      Dimension("order_status", "source.o_orderstatus"),
      Dimension("line_status", "li.l_linestatus", join = Some("li"))),
    measures = Seq(
      Measure("order_count", "CAST(COUNT(*) AS BIGINT)"),
      Measure("sum_totalprice",
        "CAST(CAST(SUM(CAST(source.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)")))

  private def registerStar(s: SparkSession, d: String): Unit =
    Seq("lineitem", "orders", "part", "supplier").foreach(n =>
      table(s, d, n).createOrReplaceTempView(n))

  val queries: Map[String, Q] = Map(
    // U1 — sentiment scoring UDF under the F4 null-guard, with the C3/C4
    // sponsored down-weighting (`reviews_fact.py:103-109,162-167`)
    "u1_sentiment_udf" -> ((s, d) => {
      registerAi(s)
      table(s, d, "documents")
        .withColumn("sentiment_score",
          when(col("text").isNull || col("text") === "", lit(0))
            .otherwise(expr("sentiment_score(text)")))
        .withColumn("sponsored", col("source").isin("src0", "src1"))
        .withColumn("weighted_score",
          when(col("sponsored"), col("sentiment_score") * lit(0.5))
            .otherwise(col("sentiment_score") * lit(1.0))
            .cast("decimal(18,1)"))
        .select(col("doc_id"), col("sentiment_score"), col("weighted_score"))
    }),

    // U2 — ai_query translation with "NA" fallback
    // (`auxillary_dims.py:14-27`)
    "u2_ai_translate" -> ((s, d) => {
      registerAi(s)
      table(s, d, "documents")
        .withColumn("lang_name", expr("ai_query('offline-dict', lang)"))
        .groupBy(col("lang"), col("lang_name"))
        .agg(count(lit(1)).as("n"))
    }),

    // U3 — DQ rule engine: uniqueness + range + not-null per row
    // (`data_quality.py:24-46`)
    "dq_checks" -> ((s, d) => {
      val checked = DQEngine.applyChecks(table(s, d, "orders"), Seq(
        IsUnique(Seq("o_custkey")),
        IsInRange("o_totalprice", 0, 300000),
        IsNotNull("o_orderpriority")))
      checked.select(col("o_orderkey"),
        size(col("_errors")).cast("int").as("n_errors"))
    }),

    // K3/J5 — metric query: measures by a joined dimension (only the part
    // join is included)
    "m1_metric_by_brand" -> ((s, d) => {
      registerStar(s, d)
      lineitemView.query(s, Seq("line_count", "sum_revenue", "avg_quantity"),
        Seq("brand"))
    }),

    // join pruning: source-only dims → zero joins in the plan
    "m2_metric_no_join" -> ((s, d) => {
      registerStar(s, d)
      lineitemView.query(s, Seq("line_count", "discounted_pct"),
        Seq("return_flag"))
    }),

    // multi-dim + dialect-split exact-median measure + ad-hoc filter
    "m3_metric_multi_dim" -> ((s, d) => {
      registerStar(s, d)
      lineitemView.query(s, Seq("line_count", "median_quantity"),
        Seq("order_status", "ship_year"),
        where = Some("source.l_discount > 0.02"))
    }),

    // intentional 1:many fan-out grain (SURVEY.md §7.4.3)
    "m4_metric_fanout" -> ((s, d) => {
      registerStar(s, d)
      ordersFanoutView.query(s, Seq("order_count", "sum_totalprice"),
        Seq("line_status"))
    }),

    // declarative authoring: the view built FROM THE YAML DOCUMENT (the
    // reference's analyst surface) must compile to the same plan as the
    // code-authored view — same request as m1, same oracle text
    "m7_metric_yaml" -> ((s, d) => {
      registerStar(s, d)
      MetricViewYaml.parse(lineitemViewYaml)
        .query(s, Seq("line_count", "sum_revenue", "avg_quantity"),
          Seq("brand"))
    }),

    // HAVING on aggregated measures (post-agg filter in the metric layer)
    "m6_metric_having" -> ((s, d) => {
      registerStar(s, d)
      lineitemView.query(s, Seq("line_count", "avg_quantity"), Seq("brand"),
        having = Some("line_count >= 2000"))
    }),

    // display()/ad-hoc exploration shape (`analysis.sql:29-37`,
    // `auxillary_dims.py:35`): a deterministic LIMIT-10 sample with
    // ai_query applied to the sampled rows only — the notebook's "peek at
    // a few AI-scored rows" pattern
    "x1_adhoc_sample" -> ((s, d) => {
      registerAi(s)
      table(s, d, "documents")
        .orderBy(col("doc_id")).limit(10)
        .select(col("doc_id"), col("lang"),
          expr("ai_query('offline-dict', lang)").as("lang_name"),
          when(col("text").isNull || col("text") === "", lit(0))
            .otherwise(expr("sentiment_score(text)")).as("sentiment"))
    }),

    // K3 — registered-view round trip: CREATE VIEW + SQL over it
    "m5_view_roundtrip" -> ((s, d) => {
      registerStar(s, d)
      ordersFanoutView.registerView(s, "order_metrics")
      s.sql("SELECT * FROM order_metrics")
    })
  )

  val oracle: Map[String, String] = Map(
    "u1_sentiment_udf" ->
      """SELECT doc_id,
        | CAST(CASE
        |  WHEN text IS NULL OR text = '' THEN 0
        |  WHEN length(trim(text)) < 3 THEN 0
        |  WHEN contains(lower(trim(text)), 'fast') THEN 5
        |  WHEN contains(lower(trim(text)), 'slow') THEN -5
        |  WHEN contains(lower(trim(text)), 'merge') THEN 2
        |  WHEN contains(lower(trim(text)), 'batch') THEN -2
        |  ELSE 1 END AS INTEGER) AS sentiment_score,
        | CAST(CAST(CAST(CASE
        |  WHEN text IS NULL OR text = '' THEN 0
        |  WHEN length(trim(text)) < 3 THEN 0
        |  WHEN contains(lower(trim(text)), 'fast') THEN 5
        |  WHEN contains(lower(trim(text)), 'slow') THEN -5
        |  WHEN contains(lower(trim(text)), 'merge') THEN 2
        |  WHEN contains(lower(trim(text)), 'batch') THEN -2
        |  ELSE 1 END AS DOUBLE)
        |  * (CASE WHEN source IN ('src0','src1') THEN 0.5 ELSE 1.0 END)
        |  AS DECIMAL(18,1)) AS DOUBLE) AS weighted_score
        | FROM documents""".stripMargin,
    "u2_ai_translate" ->
      """SELECT lang,
        | CASE lang WHEN 'en' THEN 'English' WHEN 'de' THEN 'German'
        |  WHEN 'fr' THEN 'French' WHEN 'es' THEN 'Spanish' ELSE 'NA' END AS lang_name,
        | CAST(COUNT(*) AS BIGINT) AS n
        | FROM documents GROUP BY 1, 2""".stripMargin,
    "x1_adhoc_sample" ->
      """SELECT doc_id, lang,
        | CASE lang WHEN 'en' THEN 'English' WHEN 'de' THEN 'German'
        |  WHEN 'fr' THEN 'French' WHEN 'es' THEN 'Spanish' ELSE 'NA' END AS lang_name,
        | CAST(CASE
        |  WHEN text IS NULL OR text = '' THEN 0
        |  WHEN length(trim(text)) < 3 THEN 0
        |  WHEN contains(lower(trim(text)), 'fast') THEN 5
        |  WHEN contains(lower(trim(text)), 'slow') THEN -5
        |  WHEN contains(lower(trim(text)), 'merge') THEN 2
        |  WHEN contains(lower(trim(text)), 'batch') THEN -2
        |  ELSE 1 END AS INTEGER) AS sentiment
        | FROM documents ORDER BY doc_id LIMIT 10""".stripMargin,
    "dq_checks" ->
      """SELECT o_orderkey,
        | CAST((CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
        |  + (CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice BETWEEN 0 AND 300000) THEN 1 ELSE 0 END)
        |  + (CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_errors
        | FROM (SELECT *, COUNT(*) OVER (PARTITION BY o_custkey) AS cnt FROM orders)""".stripMargin,
    "m1_metric_by_brand" ->
      lineitemView.toSql(Seq("line_count", "sum_revenue", "avg_quantity"),
        Seq("brand")),
    // the PARSED view generates the oracle SQL too — both surfaces of the
    // document round-trip through MetricViewYaml
    "m7_metric_yaml" ->
      MetricViewYaml.parse(lineitemViewYaml)
        .toSql(Seq("line_count", "sum_revenue", "avg_quantity"),
          Seq("brand")),
    "m2_metric_no_join" ->
      lineitemView.toSql(Seq("line_count", "discounted_pct"),
        Seq("return_flag")),
    "m3_metric_multi_dim" ->
      lineitemView.toSql(Seq("line_count", "median_quantity"),
        Seq("order_status", "ship_year"),
        where = Some("source.l_discount > 0.02")),
    "m4_metric_fanout" ->
      ordersFanoutView.toSql(Seq("order_count", "sum_totalprice"),
        Seq("line_status")),
    "m6_metric_having" ->
      lineitemView.toSql(Seq("line_count", "avg_quantity"), Seq("brand"),
        having = Some("line_count >= 2000")),
    "m5_view_roundtrip" ->
      ordersFanoutView.toSql(
        ordersFanoutView.measures.map(_.name),
        ordersFanoutView.dimensions.map(_.name))
  )
}
