package graft.ai

/** Online LLM client/scorer — the production counterpart of the
  * deterministic stubs, matching the reference's transport and fallback
  * semantics (`/root/reference/src/notebooks/modelling/reviews_fact.py:35-96`):
  * OpenAI-compatible chat endpoint, temperature 0, max_tokens 20, JSON
  * response format, 30s timeout; response parsing takes `{"score": int}`,
  * falls back to the first integer in the text, and returns 0 on any error.
  *
  * This environment has zero egress, so the HTTP path is exercised only for
  * request/response shaping in specs; `ResponseParser` (pure) carries the
  * behavioral contract. Deployments must register the scoring UDF
  * `asNondeterministic` and materialize scored batches before reuse
  * (SURVEY.md §7.4.1).
  */
object ResponseParser {

  private val ScoreJson = """"score"\s*:\s*(-?\d+)""".r.unanchored
  private val FirstInt = """(-?\d+)""".r.unanchored

  /** ≙ `reviews_fact.py:76-96`: JSON field, then bare-integer fallback,
    * then 0.
    */
  def parseScore(body: String): Int = body match {
    case null => 0
    case ScoreJson(v) => clamp(v)
    case FirstInt(v) => clamp(v)
    case _ => 0
  }

  /** Scores outside the rubric's [-5, 5] are transport garbage → 0. */
  private def clamp(v: String): Int =
    try { val i = v.toInt; if (i >= -5 && i <= 5) i else 0 }
    catch { case _: NumberFormatException => 0 }

  /** The request payload shape of `reviews_fact.py:61-70`. */
  def requestBody(model: String, prompt: String): String = {
    import graft.util.JsonEscape.{quote => q}
    s"""{"model":${q(model)},"messages":[{"role":"user","content":${q(prompt)}}],""" +
      s""""temperature":0.0,"max_tokens":20,"response_format":{"type":"json_object"}}"""
  }
}

/** Blocking HTTP scorer over `java.net.http` (30s timeout ≙
  * `reviews_fact.py:73`). One request per row like the reference; for
  * production-scale use, call through `mapPartitions` so connections
  * amortize per partition rather than per row.
  */
final class HttpLlmScorer(endpoint: String, model: String,
                          promptPrefix: String) extends SentimentScorer {

  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30)).build()

  override def score(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    try {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(30))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          ResponseParser.requestBody(model, promptPrefix + text)))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      ResponseParser.parseScore(resp.body())
    } catch { case scala.util.control.NonFatal(_) => 0 } // ≙ 0-on-any-error
  }
}
