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
}
