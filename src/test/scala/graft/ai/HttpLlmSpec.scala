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

  test("scoreBatch sends ONE request per chunk; scores stitch back in order") {
    val calls = new AtomicInteger(0)
    @volatile var seen: String = null
    withServer { ex =>
      calls.incrementAndGet()
      seen = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      respond(ex, 200, chatCompletion("""{"scores": [3, -1]}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "Rate: ")
      val got = scorer.scoreBatch(Iterator("a1", null, "b2", "")).toSeq
      assert(got == Seq(3, 0, -1, 0)) // null/empty stay 0, never sent
    }
    assert(calls.get() == 1) // 4 texts, one HTTP request
    assert(seen.contains("""1. a1\n2. b2""")) // numbered, empties excluded
    assert(seen.contains(""""max_tokens":40""")) // 20 per answer
  }

  test("scoreBatch chunks at batchSize: ceil(n/batchSize) requests") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      respond(ex, 200, chatCompletion("""{"scores": [1, 2]}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "") {
        override def batchSize: Int = 2
      }
      val got = scorer.scoreBatch(Iterator("a1", "b2", "c3", "d4")).toSeq
      assert(got == Seq(1, 2, 1, 2))
    }
    assert(calls.get() == 2)
  }

  test("a reply without a well-formed scores array falls back to per-row") {
    // per-row-shaped reply: batched parse is None (no silent misalignment),
    // the chunk re-scores row by row through the reference's parseScore
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      respond(ex, 200, chatCompletion("""{"score": 2}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "")
      val got = scorer.scoreBatch(Iterator("a1", null, "b2", "")).toSeq
      assert(got == Seq(2, 0, 2, 0))
    }
    assert(calls.get() == 3) // 1 failed batch + 2 per-row fallbacks
  }

  test("a scores array with the WRONG count falls back instead of stitching") {
    val batchCalls = new AtomicInteger(0)
    withServer { ex =>
      batchCalls.incrementAndGet()
      // 3 scores for 2 texts on the batch call; per-row fallback then sees
      // the same body and parseScore's integer fallback yields 1
      respond(ex, 200, chatCompletion("""{"scores": [1, 2, 3]}"""))
    } { url =>
      val scorer = new HttpLlmScorer(url, "m", "")
      val got = scorer.scoreBatch(Iterator("a1", "b2")).toSeq
      assert(got == Seq(1, 1))
    }
    assert(batchCalls.get() == 3)
  }
}

/** The partition-batched scoring path over a real Spark job: connections
  * must scale with PARTITIONS and requests with rows/batchSize, not rows
  * — the SURVEY §2.9 batching claim, measured at the loopback server by
  * distinct client sockets and request count.
  */
class HttpBatchedScoringSpec extends graft.SparkSpec {
  import spark.implicits._

  test("withSentimentBatched: connections ≤ partitions, requests ≪ rows") {
    val remotes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val requests = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat", ex => {
      remotes.add(ex.getRemoteAddress.toString)
      requests.incrementAndGet()
      val req = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      // every row's text is "text <i>" — counting the marker recovers the
      // chunk size so the stub answers with exactly n scores
      val n = """text \d+""".r.findAllIn(req).length
      val scores = Seq.fill(n)("2").mkString(", ")
      val body =
        (s"""{"id":"c","choices":[{"index":0,"message":{"role":"assistant",""" +
          s""""content":"{\\"scores\\": [$scores]}"}}]}""").getBytes(UTF_8)
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
      // 40 rows over 4 round-robin partitions at batchSize 16 → one
      // batched request per partition; bound loosely against splits
      assert(requests.get() < 40 && requests.get() <= 2 * nPart,
        s"expected ≪ 40 requests, saw ${requests.get()}")
      assert(remotes.size <= nPart, // connections ≤ partitions
        s"expected ≤ $nPart client sockets, saw ${remotes.size}: $remotes")
    } finally server.stop(0)
  }
}
