package graft.ai

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

/** Integration coverage for the production HTTP scorer against a loopback
  * HTTP stub (no network egress): request shape, OpenAI-response parsing,
  * the regex fallback, non-2xx handling, timeout, and the null/empty
  * short-circuit — the contract of `reviews_fact.py:61-96`.
  */
class HttpLlmSpec extends AnyFunSuite {

  /** Serve `handler` on an ephemeral loopback port for the test's scope. */
  private def withServer(handler: HttpExchange => Unit)
                        (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat", ex => handler(ex))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** An OpenAI-shaped chat completion whose message content is `content`. */
  private def chatCompletion(content: String): String = {
    import graft.util.JsonEscape.{quote => q}
    s"""{"id":"cmpl-1","choices":[{"index":0,"message":{"role":"assistant","content":${q(content)}}}]}"""
  }

  test("request carries the reference's payload: model, temp 0, max_tokens 20, json format, prompt") {
    @volatile var seen: String = null
    withServer { ex =>
      seen = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      respond(ex, 200, chatCompletion("""{"score": 1}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "test-model", "Rate this review: ")
      assert(scorer.score("great game") == 1)
    }
    assert(seen.contains(""""model":"test-model""""))
    assert(seen.contains(""""temperature":0.0"""))
    assert(seen.contains(""""max_tokens":20"""))
    assert(seen.contains(""""response_format":{"type":"json_object"}"""))
    assert(seen.contains("Rate this review: great game"))
  }

  test("JSON score in the content parses, including negatives") {
    withServer(ex => respond(ex, 200, chatCompletion("""{"score": -5}"""))) {
      url =>
        assert(new HttpLlmScorer(url, "m", "").score("bad") == -5)
    }
  }

  test("non-JSON content falls back to the first integer, then to 0") {
    withServer(ex => respond(ex, 200, chatCompletion("I'd rate it 2 of 5"))) {
      url => assert(new HttpLlmScorer(url, "m", "").score("ok") == 2)
    }
    withServer(ex => respond(ex, 200, chatCompletion("no digits here"))) {
      url => assert(new HttpLlmScorer(url, "m", "").score("ok") == 0)
    }
  }

  test("non-2xx responses score 0 even when the error body carries digits") {
    // ≙ raise_for_status: a 429 with 'retry after 3 seconds' must NOT
    // become sentiment 3
    withServer(ex =>
      respond(ex, 429, """{"error":"rate limited, retry after 3 seconds"}""")) {
      url => assert(new HttpLlmScorer(url, "m", "").score("x") == 0)
    }
  }

  test("a response slower than the timeout scores 0") {
    withServer { ex =>
      Thread.sleep(3000)
      respond(ex, 200, chatCompletion("""{"score": 4}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "", timeoutSeconds = 1)
      val t0 = System.nanoTime()
      assert(scorer.score("x") == 0)
      assert((System.nanoTime() - t0) / 1e9 < 2.5) // gave up at ~1s
    }
  }

  test("a connection error (dead endpoint) scores 0") {
    // bind-then-close to grab a port nothing listens on
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = s.getAddress.getPort
    s.stop(0)
    assert(new HttpLlmScorer(s"http://127.0.0.1:$port/v1/chat", "m", "")
      .score("x") == 0)
  }

  test("null/empty text short-circuits to 0 without any HTTP call") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      respond(ex, 200, chatCompletion("""{"score": 5}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "")
      assert(scorer.score(null) == 0)
      assert(scorer.score("") == 0)
    }
    assert(calls.get() == 0)
  }

  test("scoreBatch reuses one instance: every text scored, order preserved") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      respond(ex, 200, chatCompletion("""{"score": 3}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "")
      val got = scorer.scoreBatch(Iterator("a1", null, "b2", "")).toSeq
      assert(got == Seq(3, 0, 3, 0))
    }
    assert(calls.get() == 2) // null/empty short-circuit inside the batch too
  }
}

/** The partition-batched scoring path over a real Spark job: connections
  * must scale with PARTITIONS, not rows — the SURVEY §2.9 batching claim,
  * measured at the loopback server by distinct client sockets.
  */
class HttpBatchedScoringSpec extends graft.SparkSpec {
  import spark.implicits._

  test("withSentimentBatched opens at most one connection per partition") {
    val remotes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val rows = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat", ex => {
      remotes.add(ex.getRemoteAddress.toString)
      rows.incrementAndGet()
      val body = """{"id":"c","choices":[{"index":0,"message":{"role":"assistant","content":"{\"score\": 2}"}}]}"""
        .getBytes(UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat"
      val nPart = 4
      val df = (1 to 40).map(i => (i.toLong, s"text $i")).toDF("id", "text")
        .repartition(nPart)
      val scored = graft.ai.AiFunctions.withSentimentBatched(
        df, "text", "sentiment", () => new HttpLlmScorer(url, "m", ""))
      assert(scored.columns.toSeq == Seq("id", "text", "sentiment"))
      val got = scored.select($"sentiment").as[Int].collect()
      assert(got.length == 40 && got.forall(_ == 2))
      assert(rows.get() == 40) // one request per row...
      assert(remotes.size <= nPart, // ...but connections ≤ partitions
        s"expected ≤ $nPart client sockets, saw ${remotes.size}: $remotes")
    } finally server.stop(0)
  }
}
