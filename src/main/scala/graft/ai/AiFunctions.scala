package graft.ai

import org.apache.spark.sql.SparkSession

/** Pluggable LLM surface.
  *
  * The reference calls an OpenAI-compatible chat endpoint per row from a
  * Python UDF (`/root/reference/src/notebooks/modelling/reviews_fact.py:35-109`)
  * and Databricks' builtin `ai_query`
  * (`auxillary_dims.py:14-27`, `analysis.sql:29-37`). This environment has
  * zero egress, so the client is a trait: tests and the offline default use
  * deterministic implementations; an HTTP implementation can be slotted in
  * behind the same interface (and must be registered `asNondeterministic`,
  * batched via `mapPartitions` to amortize connections — SURVEY.md §2.9).
  */
trait LlmClient {

  /** ≙ `ai_query(model, prompt)` — returns "NA" on failure
    * (`auxillary_dims.py:23`).
    */
  def query(model: String, prompt: String): String
}

/** Sentiment rubric of `reviews_fact.py:16-25,43-54`: +5 very positive,
  * +2 somewhat positive, +1 neutral, −2 somewhat negative, −5 very negative,
  * 0 not understandable; 0 on any parse/transport error
  * (`reviews_fact.py:76-96`).
  */
trait SentimentScorer extends Serializable {
  def score(text: String): Int
}

/** Deterministic keyword-rubric scorer (test/offline default).
  *
  * Keyword lists are parameters so tests can tune them to a corpus; the
  * defaults mirror the reference rubric's sentiment intent. Precedence is
  * fixed (strong-positive, strong-negative, mild-positive, mild-negative,
  * else neutral +1) so the function is pure and SQL-mirrorable — the DuckDB
  * oracle expresses the identical CASE chain.
  */
final case class DeterministicRubricScorer(
    strongPos: Seq[String] = Seq("excellent", "amazing", "awesome", "perfect"),
    strongNeg: Seq[String] = Seq("terrible", "awful", "unplayable", "worst"),
    mildPos: Seq[String] = Seq("good", "great", "fun", "enjoy"),
    mildNeg: Seq[String] = Seq("boring", "crash", "bug", "poor")
) extends SentimentScorer {

  override def score(text: String): Int = {
    if (text == null) return 0
    val t = text.trim.toLowerCase
    if (t.length < 3) 0 // "not understandable" bucket (`reviews_fact.py:24`)
    else if (strongPos.exists(t.contains)) 5
    else if (strongNeg.exists(t.contains)) -5
    else if (mildPos.exists(t.contains)) 2
    else if (mildNeg.exists(t.contains)) -2
    else 1
  }
}

/** Deterministic dictionary translator backing the `ai_query` translation
  * use (`auxillary_dims.py:14-27`): dictionary hit → translation, miss →
  * "NA" (the reference's failure value).
  */
final case class DictionaryTranslator(dict: Map[String, String])
    extends LlmClient {
  override def query(model: String, prompt: String): String =
    dict.getOrElse(prompt, "NA")
}

/** UDF registration — SQL surface `sentiment_score(text)` /
  * `ai_query(model, prompt)` matching the reference call sites
  * (`reviews_fact.py:99`, `auxillary_dims.py:15-27`).
  */
object AiFunctions {

  def register(spark: SparkSession, scorer: SentimentScorer,
               client: LlmClient): Unit = {
    spark.udf.register("sentiment_score", (text: String) => scorer.score(text))
    spark.udf.register("ai_query",
      (model: String, prompt: String) => client.query(model, prompt))
  }
}
