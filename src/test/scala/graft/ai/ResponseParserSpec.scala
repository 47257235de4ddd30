package graft.ai

import org.scalatest.funsuite.AnyFunSuite

/** U1 transport semantics ≙ `reviews_fact.py:61-96`: JSON score field,
  * regex integer fallback, 0 on garbage; request payload carries the
  * reference's decoding parameters.
  */
class ResponseParserSpec extends AnyFunSuite {

  test("parses the json_object response shape") {
    assert(ResponseParser.parseScore("""{"score": 5}""") == 5)
    assert(ResponseParser.parseScore("""{"score":-2}""") == -2)
    assert(ResponseParser.parseScore("""{ "score" : 0 }""") == 0)
  }

  test("falls back to the first integer in free text") {
    assert(ResponseParser.parseScore("I'd say 2 out of 5") == 2)
    assert(ResponseParser.parseScore("rating: -5!") == -5)
  }

  test("returns 0 on unparseable or out-of-rubric responses") {
    assert(ResponseParser.parseScore("no digits here") == 0)
    assert(ResponseParser.parseScore("") == 0)
    assert(ResponseParser.parseScore(null) == 0)
    assert(ResponseParser.parseScore("""{"score": 999}""") == 0)
  }

  test("request body pins temperature 0, max_tokens 20, json format") {
    val body = ResponseParser.requestBody("m-1", "Rate: \"great\"\nok")
    assert(body.contains(""""temperature":0.0"""))
    assert(body.contains(""""max_tokens":20"""))
    assert(body.contains(""""response_format":{"type":"json_object"}"""))
    assert(body.contains("""\"great\""""))
    assert(body.contains("""\n"""))
  }

  test("batch request numbers the texts and scales max_tokens") {
    val body = ResponseParser.batchRequestBody("m-1", "Rate: ",
      Seq("first", "second", "third"))
    assert(body.contains("""1. first\n2. second\n3. third"""))
    assert(body.contains(""""max_tokens":60"""))
    assert(body.contains(""""temperature":0.0"""))
    assert(body.contains(""""response_format":{"type":"json_object"}"""))
  }

  test("parseScores: exact-count arrays parse with clamping; anything else is None") {
    assert(ResponseParser.parseScores("""{"scores": [1, -2, 999]}""", 3)
      .contains(Seq(1, -2, 0))) // out-of-rubric clamps like the per-row path
    assert(ResponseParser.parseScores("""{"scores": [1, 2]}""", 3).isEmpty)
    assert(ResponseParser.parseScores("""{"scores": [1, "x", 3]}""", 3).isEmpty)
    assert(ResponseParser.parseScores("""{"score": 4}""", 1).isEmpty)
    assert(ResponseParser.parseScores(null, 1).isEmpty)
  }
}
