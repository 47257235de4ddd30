package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

/** Property-based check of STREAMING-MODE sessionization across multiple
  * micro-batches — the state-store path the batch-mode oracle test cannot
  * reach: state written by batch N must be encoded, persisted, read back,
  * and extended by batch N+1 (this delivery caught a real defect: the
  * state case class was `private`, which batch mode — live objects, one
  * group pass — tolerated, while the streaming state encoder's generated
  * code failed to compile at runtime).
  *
  * Random event sets are delivered time-ordered in three micro-batches
  * (the operator's documented delivery contract: per-user event-time
  * order ACROSS batches; within a batch it sorts), and the LAST update
  * per user must equal the in-memory gap-sessionization of the full set.
  *
  * Synchronization note: `processAllAvailable` is unusable here BY
  * CONSTRUCTION, not flakiness — with ProcessingTimeTimeout the stateful
  * operator reports work on every trigger (a timeout could always have
  * expired), so the engine never raises the no-new-data signal that call
  * waits on. Batch separation is driven by polling the sink instead:
  * both summary counters are monotone per user, so "every user of the
  * chunks delivered so far shows its cumulative event count" is an exact
  * consumed-barrier, and the next chunk is only added once it holds.
  */
class StreamingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(4)
  private val runId = new AtomicInteger(0)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // small user/time domains force multi-session users and users whose
  // sessions span micro-batch boundaries
  private val eventsGen: Gen[List[EventStreams.Event]] =
    Gen.listOfN(24, for {
      id <- Gen.choose(0L, 1000000L)
      user <- Gen.choose(0L, 3L)
      sec <- Gen.choose(0L, 60L)
    } yield EventStreams.Event(id, new Timestamp(sec * 1000L), user,
      "click", 1.0)).map(_.distinctBy(_.event_id))

  private def waitUntil(what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for: $what")
  }

  test("streaming sessionize over 3 micro-batches == in-memory gap oracle") {
    val gapSeconds = 5L
    check(Prop.forAll(eventsGen) { evts =>
      // deliver in event-time order (the operator's cross-batch contract)
      val sorted = evts.sortBy(e => (e.ts.getTime, e.event_id))
      val chunkLen = math.max(1, (sorted.length + 2) / 3)
      val chunks = sorted.grouped(chunkLen).toList

      implicit val s = spark
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[EventStreams.Event]
      val sink = s"sess_prop_${runId.incrementAndGet()}"
      val q = EventStreams.sessionize(input.toDS(), gapSeconds)
        .writeStream.outputMode("update")
        .trigger(Trigger.ProcessingTime("25 milliseconds"))
        .format("memory").queryName(sink).start()

      def sinkState(): Map[Long, (Int, Long)] =
        spark.table(sink).as[EventStreams.SessionSummary].collect()
          .groupBy(_.user_id).map { case (u, xs) =>
            u -> ((xs.map(_.n_sessions).max, xs.map(_.n_events).max))
          }

      val got =
        try {
          var delivered = Map.empty[Long, Long] // user -> cumulative events
          chunks.foreach { c =>
            input.addData(c)
            delivered = c.foldLeft(delivered) { (m, e) =>
              m.updated(e.user_id, m.getOrElse(e.user_id, 0L) + 1L)
            }
            val want = delivered
            // consumed-barrier: the next chunk must land in a LATER batch
            waitUntil(s"chunk of ${c.length} events consumed") {
              val st = sinkState()
              want.forall { case (u, n) => st.get(u).exists(_._2 == n) }
            }
          }
          sinkState()
        } finally {
          q.stop()
          spark.catalog.dropTempView(sink) // memory-sink rows die with the view
        }

      val gapMicros = gapSeconds * 1000000L
      val expected = evts.groupBy(_.user_id).map { case (u, es) =>
        val ts = es.sortBy(e => (e.ts.getTime, e.event_id))
          .map(_.ts.getTime * 1000L)
        val sessions = 1 + ts.zip(ts.tail).count { case (a, b) =>
          b - a > gapMicros
        }
        u -> ((sessions, es.length.toLong))
      }
      got == expected
    })
  }
}
