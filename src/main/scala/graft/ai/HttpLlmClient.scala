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

  /** ONE request for a whole chunk of texts — the batched transport of
    * [[HttpLlmScorer.scoreBatch]]: the per-text instruction is stated
    * once, the texts are numbered, and the model is asked for
    * `{"scores": [...]}` with one integer per text in order. Same
    * envelope as [[requestBody]] (temperature 0, JSON response format ≙
    * `reviews_fact.py:61-70`), with `max_tokens` scaled to the chunk
    * (the per-row shape's 20 per answer).
    */
  def batchRequestBody(model: String, promptPrefix: String,
                       texts: Seq[String]): String = {
    import graft.util.JsonEscape.{quote => q}
    val numbered = texts.zipWithIndex
      .map { case (t, i) => s"${i + 1}. $t" }.mkString("\n")
    val prompt =
      "Apply this instruction to each numbered text and respond with JSON " +
        """{"scores": [...]} containing one integer per text, in order. """ +
        s"Instruction: $promptPrefix\n$numbered"
    s"""{"model":${q(model)},"messages":[{"role":"user","content":${q(prompt)}}],""" +
      s""""temperature":0.0,"max_tokens":${20 * texts.size},""" +
      s""""response_format":{"type":"json_object"}}"""
  }

  private val ScoresJson = """"scores"\s*:\s*\[([^\]]*)\]""".r.unanchored

  /** Parse a batched response: `Some` iff the content carries a `"scores"`
    * array with EXACTLY `n` integers (each range-clamped like the per-row
    * path). Any other shape — missing array, wrong count, non-integer
    * entries — is `None`, and the caller decides the fallback; a silent
    * partial stitch could misalign scores with texts.
    */
  def parseScores(body: String, n: Int): Option[Seq[Int]] = body match {
    case null => None
    case ScoresJson(list) =>
      val parts = list.split(",").map(_.trim).filter(_.nonEmpty)
      if (parts.length != n || !parts.forall(_.matches("-?\\d+"))) None
      else Some(parts.toSeq.map(clamp))
    case _ => None
  }
}

/** Blocking HTTP scorer over `java.net.http` (30s default timeout ≙
  * `reviews_fact.py:73`; injectable for specs). [[score]] is one request
  * per row like the reference; [[scoreBatch]] overrides the trait's
  * per-row default with ONE request per [[batchSize]] texts, so the
  * partition-batched entry point [[AiFunctions.withSentimentBatched]]
  * amortizes both connections (one scorer/partition via `mapPartitions`)
  * AND request count (requests ≈ rows / batchSize, not rows).
  *
  * Covered end to end (request shape, parse, fallback, non-2xx, timeout,
  * null short-circuit, batched request amortization + per-row fallback)
  * by `HttpLlmSpec` against a loopback HTTP stub — no network egress
  * involved.
  */
class HttpLlmScorer(endpoint: String, model: String,
                    promptPrefix: String,
                    timeoutSeconds: Int = 30) extends SentimentScorer {

  /** Texts per batched HTTP request in [[scoreBatch]]. Bounded so the
    * scaled completion budget (`max_tokens` = 20·n, the per-row shape's
    * 20 per answer) stays within typical serving limits; override for a
    * deployment's actual context window.
    */
  protected def batchSize: Int = 16

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

  /** One HTTP request per [[batchSize]] texts (vs the trait's per-row
    * default): each chunk's non-empty texts go out as a single numbered
    * prompt ([[ResponseParser.batchRequestBody]]) and the `{"scores":
    * [...]}` reply is stitched back by position. Null/empty texts keep
    * the per-row 0 short-circuit without being sent. A reply that is
    * non-2xx, unparseable, or carries the wrong score count falls back
    * to per-row [[score]] for that chunk only — alignment is never
    * guessed, and the 1:1 texts↔scores contract holds on every path.
    */
  override def scoreBatch(texts: Iterator[String]): Iterator[Int] =
    texts.grouped(batchSize).flatMap { chunk =>
      val idx =
        chunk.indices.filter(i => chunk(i) != null && chunk(i).nonEmpty)
      if (idx.isEmpty) chunk.map(_ => 0)
      else batchScores(idx.map(chunk)) match {
        case Some(scores) =>
          val out = Array.fill(chunk.length)(0)
          idx.iterator.zip(scores.iterator)
            .foreach { case (i, s) => out(i) = s }
          out.toSeq
        case None => chunk.map(score)
      }
    }

  private def batchScores(texts: Seq[String]): Option[Seq[Int]] =
    try {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          ResponseParser.batchRequestBody(model, promptPrefix, texts)))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2) None
      else ResponseParser.parseScores(
        ResponseParser.extractContent(resp.body()), texts.size)
    } catch { case scala.util.control.NonFatal(_) => None }
}
