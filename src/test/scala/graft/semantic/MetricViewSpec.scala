package graft.semantic

import graft.SparkSpec
import graft.queries.SemanticQueries

/** MetricView compiler semantics: join pruning, fan-out grain, SQL
  * round-trip (SURVEY.md §3.3, §4, §7.4.3).
  */
class MetricViewSpec extends SparkSpec {
  import spark.implicits._

  private def registerTiny(): Unit = {
    Seq((1L, 10L, "A", 5.0), (2L, 10L, "B", 3.0), (3L, 20L, "A", 2.0))
      .toDF("f_id", "g_id", "flag", "score").createOrReplaceTempView("t_fact")
    Seq((10L, "genre-x"), (10L, "genre-y"), (20L, "genre-z"))
      .toDF("g_id", "genre").createOrReplaceTempView("t_genres")
    Seq((10L, "dev-1"), (20L, "dev-2"))
      .toDF("g_id", "dev").createOrReplaceTempView("t_devs")
  }

  private val view = MetricView(
    source = "t_fact",
    filter = Some("score IS NOT NULL"),
    joins = Seq(
      MetricJoin("genres", "t_genres", "source.g_id = genres.g_id"),
      MetricJoin("devs", "t_devs", "source.g_id = devs.g_id")),
    dimensions = Seq(
      Dimension("flag", "source.flag"),
      Dimension("genre", "genres.genre", join = Some("genres")),
      Dimension("dev", "devs.dev", join = Some("devs"))),
    measures = Seq(
      Measure("n", "CAST(COUNT(*) AS BIGINT)"),
      Measure("avg_score", "AVG(source.score)")))

  test("request touching only one join prunes the others from the plan") {
    registerTiny()
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def nJoins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case j: Join => j }.size
    // genre dim → exactly the genres join; flag dim → no join at all
    assert(nJoins(view.query(spark, Seq("n"), Seq("genre"))) == 1)
    assert(nJoins(view.query(spark, Seq("n"), Seq("flag"))) == 0)
    assert(nJoins(view.query(spark, Seq("n"), Seq("genre", "dev"))) == 2)
  }

  test("1:many join fans out measure rows (reference grain)") {
    registerTiny()
    // fact rows 1,2 have g_id=10 with TWO genres → each counted twice
    val byGenre = view.query(spark, Seq("n"), Seq("genre"))
      .as[(String, Long)].collect().toMap
    assert(byGenre == Map("genre-x" -> 2L, "genre-y" -> 2L, "genre-z" -> 1L))
    // global (no dims) stays at source grain: 3 rows
    val global = view.query(spark, Seq("n")).as[Long].head()
    assert(global == 3L)
  }

  test("view filter and ad-hoc where compose") {
    registerTiny()
    val n = view.query(spark, Seq("n"), Nil, where = Some("source.score > 2.5"))
      .as[Long].head()
    assert(n == 2L)
  }

  test("registered view returns same rows as compiled DataFrame") {
    registerTiny()
    view.registerView(spark, "tiny_metrics")
    val viaSql = spark.sql(
      "SELECT * FROM tiny_metrics ORDER BY flag, genre, dev").collect().toSeq
    val viaDf = view.query(spark,
      view.measures.map(_.name), view.dimensions.map(_.name))
      .orderBy("flag", "genre", "dev").collect().toSeq
    assert(viaSql == viaDf)
  }

  test("unknown dimension / measure raise a naming error") {
    registerTiny()
    assertThrows[IllegalArgumentException](
      view.query(spark, Seq("n"), Seq("nope")))
    assertThrows[IllegalArgumentException](
      view.query(spark, Seq("nope")))
  }

  test("harness views compile against sf0.001") {
    Seq("lineitem", "orders", "part", "supplier").foreach(n =>
      spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
        .createOrReplaceTempView(n))
    val df = SemanticQueries.lineitemView.query(spark,
      Seq("line_count", "median_quantity"), Seq("brand", "order_status"))
    assert(df.count() > 0)
  }
}
