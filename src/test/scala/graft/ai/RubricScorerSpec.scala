package graft.ai

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}

/** Rubric invariants from `reviews_fact.py:16-25,43-54,76-96` (SURVEY.md §5):
  * score ∈ {−5,−2,0,1,2,5}; null/empty → 0; precedence is fixed.
  */
class RubricScorerSpec extends AnyFunSuite {

  private val scorer = DeterministicRubricScorer()
  private val valid = Set(-5, -2, 0, 1, 2, 5)

  test("score is always in the rubric set (property)") {
    val prop = Prop.forAll { (s: String) => valid.contains(scorer.score(s)) }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("null and not-understandable inputs score 0") {
    assert(scorer.score(null) == 0)
    assert(scorer.score("") == 0)
    assert(scorer.score("  ") == 0)
    assert(scorer.score("ab") == 0)
  }

  test("keyword buckets and precedence") {
    assert(scorer.score("this game is excellent") == 5)
    assert(scorer.score("terrible port") == -5)
    assert(scorer.score("pretty good") == 2)
    assert(scorer.score("constant crash") == -2)
    assert(scorer.score("it runs on my machine") == 1)
    // strong positive wins over everything else present
    assert(scorer.score("excellent but terrible crash") == 5)
    // case/whitespace-insensitive
    assert(scorer.score("  EXCELLENT  ") == 5)
  }

  test("translator returns NA on dictionary miss (ai_query fallback)") {
    val t = DictionaryTranslator(Map("bonjour" -> "hello"))
    assert(t.query("m", "bonjour") == "hello")
    assert(t.query("m", "unknown-token") == "NA")
  }
}
