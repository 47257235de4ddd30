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
  private val ContentField =
    """"content"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.unanchored

  /** ≙ `result['choices'][0]['message']['content']` (reviews_fact.py:78):
    * pull the assistant message out of an OpenAI-shaped chat response
    * BEFORE score parsing — other response fields carry digits (`"id":
    * "cmpl-1"`, token counts) that must never win the integer fallback.
    * Bodies without the field pass through whole (proxy endpoints that
    * return the content directly).
    */
  def extractContent(body: String): String = body match {
    case null => null
    case ContentField(c) => unescapeJson(c)
    case _ => body
  }

  private def unescapeJson(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2 // covers \" \\ \/
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

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

/** Blocking HTTP scorer over `java.net.http` (30s default timeout ≙
  * `reviews_fact.py:73`; injectable for specs). One request per row like
  * the reference; for production-scale use call the partition-batched
  * entry point [[AiFunctions.withSentimentBatched]] — `mapPartitions`
  * builds one scorer here per partition, the inherited
  * [[SentimentScorer.scoreBatch]] streams that partition through this
  * instance's single lazy `client`, and connections amortize per
  * partition rather than per row.
  *
  * Covered end to end (request shape, parse, fallback, non-2xx, timeout,
  * null short-circuit, batched connection amortization) by `HttpLlmSpec`
  * against a loopback HTTP stub — no network egress involved.
  */
final class HttpLlmScorer(endpoint: String, model: String,
                          promptPrefix: String,
                          timeoutSeconds: Int = 30) extends SentimentScorer {

  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  override def score(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    try {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          ResponseParser.requestBody(model, promptPrefix + text)))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      // ≙ raise_for_status (reviews_fact.py:72): an error body may carry
      // digits (retry-after seconds, error codes) that must not parse as
      // a sentiment score
      if (resp.statusCode() / 100 != 2) 0
      else ResponseParser.parseScore(
        ResponseParser.extractContent(resp.body()))
    } catch { case scala.util.control.NonFatal(_) => 0 } // ≙ 0-on-any-error
  }
}
