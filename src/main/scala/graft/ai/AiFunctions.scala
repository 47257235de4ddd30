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

  /** Score a stream of texts with THIS instance — the partition-batched
    * form (SURVEY.md §2.9): called from `mapPartitions`
    * ([[AiFunctions.withSentimentBatched]]) there is one scorer — and for
    * the HTTP scorer one client/connection — per partition, so connection
    * count scales with partitions, never rows. Lazy: consumes `texts` in
    * lockstep with the caller.
    */
  def scoreBatch(texts: Iterator[String]): Iterator[Int] = texts.map(score)
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

  /** Partition-batched scoring — the production entry point for the HTTP
    * scorer: `mapPartitions` constructs ONE scorer per partition via
    * `makeScorer` and streams the partition's rows through
    * [[SentimentScorer.scoreBatch]], appending `outCol` (INT). One scorer
    * per partition means one HTTP client — and with keep-alive one
    * connection — per partition, against one per ROW if the UDF path were
    * pointed at an HTTP scorer (SURVEY.md §2.9; `reviews_fact.py:35-109`
    * pays exactly that per-row cost). Null/absent text scores through the
    * scorer's own null contract (0 for every implementation here).
    * Partitioning is preserved — no shuffle, no state.
    *
    * Deployments registering HTTP-backed scoring should still mark any
    * SQL-facing UDF `asNondeterministic` and materialize scored batches
    * before reuse (SURVEY.md §7.4.1); this DataFrame-level path is the
    * form that makes the batching explicit.
    */
  def withSentimentBatched(df: org.apache.spark.sql.DataFrame,
                           textCol: String, outCol: String,
                           makeScorer: () => SentimentScorer)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val ti = df.schema.fieldIndex(textCol)
    val outSchema = df.schema
      .add(outCol, org.apache.spark.sql.types.IntegerType, nullable = false)
    df.mapPartitions { rows =>
      val scorer = makeScorer()
      // duplicate + zip keeps text extraction and row emission in lockstep
      // (bounded buffering), letting scoreBatch see one flat text stream
      val (forText, forRow) = rows.duplicate
      val scores = scorer.scoreBatch(forText.map(r =>
        if (r.isNullAt(ti)) null else r.getString(ti)))
      // zip stops at the shorter side: a scorer breaching the 1:1
      // contract would silently truncate (or drop) rows — fail loudly
      // once the pair stream is exhausted with either side non-empty
      new Iterator[Row] {
        private val zipped = forRow.zip(scores)
        override def hasNext: Boolean = {
          val h = zipped.hasNext
          if (!h && (forRow.hasNext || scores.hasNext))
            throw new IllegalStateException(
              "SentimentScorer.scoreBatch breached the one-score-per-text " +
                "contract: " + (if (forRow.hasNext) "fewer" else "more") +
                " scores than texts in this partition")
          h
        }
        override def next(): Row = {
          val (r, sc) = zipped.next(); Row.fromSeq(r.toSeq :+ sc)
        }
      }
    }(Encoders.row(outSchema))
  }
}
