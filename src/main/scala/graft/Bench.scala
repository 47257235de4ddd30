package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query at the target scale factor and
  * prints ONE JSON line `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Method: a full warmup pass at sf0.001 first (JIT + codegen + parquet
  * footer caches warm), then two timed passes over the WHOLE catalog at
  * the target SF — plus an adaptive third pass over the queries whose
  * first two shots disagreed by >20% — reporting the per-query minimum.
  * Best-of-N strips the one-time target-SF JIT (AQE-shaped plans
  * generate code the small-SF warmup never compiles) and the GC jitter
  * that dominates sub-second queries. The shots are PASS-separated, not
  * back-to-back: on a shared host a contended minute inflates every
  * consecutive shot taken inside it (measured back-to-back pairs
  * agreeing with each other while both read 2× a clean run), whereas
  * whole-catalog passes put ~the full run length between a query's
  * samples, so a transient stall must span the entire run to poison a
  * query's minimum.
  * Each query is materialized with a `noop` write — unlike `count()`, that
  * evaluates every output column, so projection-only queries can't
  * degenerate to a row count.
  *
  * Output contract (learned from BENCH_r01/r02 `parsed:null`): the harness
  * keeps only the last ~2000 chars of stdout and parses the LAST line as
  * JSON. So the line is printed after `spark.stop()` (nothing can follow
  * it), sbt's "[success]" trailer is suppressed in build.sbt, values are
  * rendered compactly (ms precision), and if the full per-query map would
  * overflow the tail buffer the FASTEST queries are dropped first
  * (`"dropped":N` records how many) — the slow ones are the signal.
  * The COMPLETE map is additionally written to `bench_full.json`
  * (override via SPARK_GRAFT_BENCH_FULL) so nothing is lost to the drop
  * rule and round-over-round comparison can cover every query; it also
  * carries BOTH shots, a per-query system-load trace (see
  * [[renderDetail]]), per-pass machine-speed calibration traces —
  * single-thread ([[calibrate]]) and throughput-class ([[tcalibrate]])
  * — and the [[volatileClass]] membership, and — on
  * an explicit `SPARK_GRAFT_STAMP=1` run only — is mirrored to a
  * round-stamped `bench_full_r<N>.json` (still write-once: a rerun
  * never clobbers the round's first stamp) so each round's canonical
  * complete map gets committed deliberately rather than
  * first-writer-wins.
  */
object Bench {

  /** The AMBIENT-VOLATILE query class — the round-13 A/B's finding
    * (SCALE_SF1.md §Round-13): sub-second queries whose timed body is
    * dominated by scoped-tmp small-file state reads plus eager
    * driver-side collects (semd2/sim4/zo2's index-riding shape) or by
    * many tiny salted shuffle partitions (sk3) measure a SAME-CODE
    * spread up to 1.40× across windows of one session — host
    * contention taxes them harder than the CPU-bound queries that set
    * `bench_diff`'s ambient median, so they can read 1.5-1.9×
    * "normalized" with zero code change. The protocol de-noises them
    * two ways (round 14): (1) STATE PRE-WARM — after the sf0.001
    * warmup they run once untimed against the TARGET dir, so the
    * compute-if-absent index build and the first-touch of its tmp
    * files land outside every timed shot (previously shot 1 carried
    * the build and the adaptive pass merely re-measured); (2) a
    * MANDATORY third shot — min-of-3 true state-riding samples
    * instead of min-of-2-where-one-held-the-build. The class is
    * recorded in the artifacts as `"volatile"` so `bench_diff` can
    * label their movements as needing a same-harness A/B before being
    * chased as regressions.
    *
    * Membership criterion (so the set can grow honestly, not by
    * vibes): a query joins when an ALTERNATING SAME-CODE A/B — the
    * SCALE_SF1.md §Round-13 method, same harness both sides — shows a
    * window spread ≳1.3× that its code cannot explain; it leaves when
    * a protocol change (e.g. hoisting its state build, as round 10 did
    * for dc2) removes the sensitivity. `BenchFormatSpec` pins every
    * entry to a live catalog query so renames can't silently
    * un-de-noise one.
    */
  val volatileClass: Set[String] = Set(
    "semd2_incremental_semantic", "sim4_ivf_persisted",
    "zo2_zorder_skipping", "sk3_power_law_agg")

  /** Compact fixed-point seconds: ms precision under 10s, cs under 100s.
    * Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    * comma-decimal locale would emit invalid JSON.
    */
  def fmt(v: Double): String =
    if (v < 0) "-1"
    else {
      val p = if (v < 10) "%.3f" else if (v < 100) "%.2f" else "%.1f"
      String.format(java.util.Locale.ROOT, p, Double.box(v))
    }

  /** One rendering for both report forms: `kept` is the subset whose
    * per-query entries appear; `total` always reflects ALL results. The
    * single body keeps the stdout line and the bench_full.json artifact
    * from ever drifting on total/marker policy.
    */
  private def render(all: Seq[(String, Double)], kept: Seq[(String, Double)],
                     dropped: Int, sf: String, extra: String): String = {
    val total = all.map(_._2).filter(_ >= 0).sum
    val qs = kept.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val drop = if (dropped > 0) s""","dropped":$dropped""" else ""
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$drop$extra,"sf":"$sf"}"""
  }

  /** Render the COMPLETE per-query map as JSON — no length cap, nothing
    * dropped. Written to a repo artifact (`bench_full.json`) every run so
    * round-over-round comparison covers every query: the stdout line's
    * drop rule keeps only the ~68 slowest, and a regression in a fast
    * query is invisible there until it gets slow enough to be reported.
    */
  def renderFull(results: Seq[(String, Double)], sf: String,
                 extra: String = ""): String =
    render(results, results, 0, sf, extra)

  /** Per-query measurement detail for the full artifact: ALL timed
    * shots (2, or 3 when the first two disagreed — see main) and the
    * 1-min system load sampled just before the query ran. A single-shot
    * wall-clock protocol cannot police a 2× bar at the ±25% ambient
    * swing measured across rounds (r11: driver 88.2 s vs same-code
    * builder run 71.7 s); with the shots plus a per-query load trace,
    * `tools/bench_diff.py` can separate uniform ambient inflation from
    * a genuine per-query regression. Rendered as `extra` sections
    * (`"shots"`, `"loads"`) so the `queries` map keeps its
    * round-over-round schema.
    */
  def renderDetail(shots: Seq[(String, Seq[(Double, Double)])]): String = {
    val s = shots.map { case (k, rs) =>
      s""""$k":${rs.map(r => fmt(r._1)).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val l = shots.map { case (k, rs) =>
      s""""$k":${rs.map(r => fmt(r._2)).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    s""","shots":$s,"loads":$l"""
  }

  /** Reported value for a query's shots: best (min) successful shot, or
    * the -1 failure marker when every shot failed.
    */
  def best(shots: Seq[Double]): Double = {
    val ok = shots.filter(_ >= 0)
    if (ok.isEmpty) -1.0 else ok.min
  }

  /** Deterministic machine-speed calibration probe: a fixed-iteration,
    * IO-free, allocation-free xorshift64 loop timed on one thread.
    * Identical work every call, every machine, every build — so the
    * ratio of two runs' calibration times measures HOST speed (steal,
    * thermal, contention), never code. This closes the attribution gap
    * `tools/bench_diff.py`'s header documents: its ambient factor is
    * the median per-query ratio over the measured queries themselves,
    * so a global code regression (a session conf, a codegen change)
    * shifts the median identically to host drift. The probe is outside
    * Spark entirely; a round whose per-query median moved 1.3× while
    * calibration moved 1.0× is a code regression, and vice versa.
    *
    * Single-threaded on purpose: host steal taxes every core, and one
    * serial dependency chain (each iteration reads the last) is the
    * cleanest steal detector — a parallel probe would also fold in the
    * bench's own local[N] sizing. Measures ~0.86 s/call on this box
    * (flat to ±2% across a session's runs); timed once per pass so the
    * trace brackets every query's shots. Callers run one untimed call
    * first (JIT warm) — see main.
    */
  def calibrate(): Double = {
    val iters = 400000000L
    var x = 0x9E3779B97F4A7C15L
    val t0 = System.nanoTime()
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    // data dependency on the fold result: the loop cannot be dead-code
    // eliminated (xorshift64 never reaches 0 from a nonzero seed)
    if (x == 0L) System.err.println("[bench] calibration fold broke")
    dt
  }

  /** Constant input for [[tcalibrate]]: 128 MiB of deterministic
    * xorshift64 longs, filled once per JVM and reused by every probe
    * call so the per-call work is allocation-free and identical.
    * 128 MiB is far past any L3, so each pass is genuine DRAM traffic.
    */
  private lazy val tcalibData: Array[Long] = {
    val a = new Array[Long](1 << 24)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < a.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; a(i) = x; i += 1
    }
    a
  }

  /** THROUGHPUT-class machine calibration probe: a fixed multi-threaded
    * scan + hash-partition pass over constant in-memory data, timed
    * wall-clock. The round-18 attribution gap this closes: the
    * single-thread [[calibrate]] probe sat flat (0.81-0.86 s) through a
    * window where the SAME CODE re-ran 1.32x slower than its own stamp
    * (SCALE.md round-18 A/B) — one thread always gets a full core, so
    * steal/bandwidth contention that taxes every PARALLEL stage is
    * invisible to it, and `bench_diff` printed a false "CODE-GLOBAL
    * regression". This probe lives in the contended class: 8 threads
    * (wide enough to feel core competition and shared memory-bandwidth
    * pressure, the resource profile of the bench's parallel stages;
    * narrow enough not to saturate the box by itself), each streaming
    * its stripe of [[tcalibData]] and XOR-accumulating into a 16-way
    * hash partition table — the map side of a shuffle, minus Spark, so
    * a session-conf or codegen change can never move it. Identical work
    * every call: thread count, pass count, and data are constants,
    * never derived from env or core count. ~0.5 s/call on this box
    * idle (window spread to ~1 s under the box's own activity — the
    * min-of-trace statistic bench_diff reads absorbs that, same as the
    * single-thread probe);
    * the ratio of two runs' minimums is the throughput-class host
    * ratio `tools/bench_diff.py` consults before calling a uniform
    * shift CODE-GLOBAL. Callers run one untimed call first (JIT +
    * fill), same as [[calibrate]].
    */
  def tcalibrate(): Double = {
    val threads = 8
    // ODD on purpose: each pass XORs the same stripe into the partition
    // table, so an even pass count cancels every fold to exactly 0 and
    // falsely trips the DCE guard below (caught by the guard itself)
    val passes = 151
    val data = tcalibData
    val stripe = data.length / threads
    val folds = new Array[Long](threads)
    // a probe thread dying (async error/OOM) must not let join() return
    // a wall time for 7/8 of the intended work — that would silently
    // skew the throughput-class host ratio bench_diff arbitrates on
    // (ADVICE r19); capture and rethrow after join instead
    val failure =
      new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t0 = System.nanoTime()
    val ts = Array.tabulate(threads) { t =>
      val th = new Thread(() => try {
        val lo = t * stripe
        val hi = lo + stripe
        val parts = new Array[Long](16)
        var p = 0
        while (p < passes) {
          var i = lo
          while (i < hi) {
            val v = data(i)
            parts((v & 15L).toInt) ^= v
            i += 1
          }
          p += 1
        }
        var acc = 0L
        var j = 0
        while (j < 16) { acc ^= parts(j); j += 1 }
        folds(t) = acc
      } catch { case e: Throwable => failure.compareAndSet(null, e) })
      th.setDaemon(true)
      th.start()
      th
    }
    ts.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    if (failure.get != null)
      throw new IllegalStateException(
        "throughput calibration probe thread died — the wall time " +
          "would understate the intended work; fix the host condition " +
          "and re-stamp", failure.get)
    // data dependency on EVERY thread's fold: the stripes cannot be
    // dead-code eliminated (a zero fold is astronomically unlikely
    // from nonzero xorshift output — and checked per fold, not only
    // all-at-once, so one dead stripe is as loud as eight)
    if (folds.exists(_ == 0L))
      System.err.println("[bench] throughput calibration fold broke")
    dt
  }

  /** Render the single-line JSON report, capped at `maxLen` chars by
    * dropping the fastest queries from the map (total always reflects all).
    *
    * `extra` carries environment context (system load before/after) —
    * cross-SESSION bench totals swing ±20% with machine conditions (the
    * same r3 binary measured 37.3 s in its own round and 43.7-44.9 s in
    * round 5), so the report records the load so a drifted total can be
    * attributed to the machine, not misread as a plan regression.
    */
  def renderLine(results: Seq[(String, Double)], sf: String,
                 maxLen: Int = 1900, extra: String = ""): String = {
    // Drop fastest-first until the rendered line fits. Failed queries
    // (v<0) sort as if infinitely slow: a failure marker is the one entry
    // that must never be dropped from the report.
    val byTime = results.sortBy { case (_, v) =>
      -(if (v < 0) Double.MaxValue else v)
    }
    var keep = results.length
    var out = render(results, results, 0, sf, extra)
    while (out.length > maxLen && keep > 1) {
      keep -= 1
      val keptNames = byTime.take(keep).map(_._1).toSet
      out = render(results, results.filter(r => keptNames(r._1)),
        results.length - keep, sf, extra)
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-mode scan parallelism: harness files are a few MB, so the
      // 128MB default gives single-task scans; clusters keep the default
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // NonFatal only: a query failure becomes the never-dropped -1 marker
    // (with the cause on stderr, which the harness doesn't parse); an OOM
    // or interrupt propagates rather than silently zeroing one entry.
    def materialize(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name @ $dir FAILED: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Per-query hygiene, OUTSIDE the timed section: without it, broadcast
    // blocks, cached relations and codegen'd classes accumulate across the
    // 60+ queries × 3 passes of one JVM and inflate late queries 8-60×
    // (GC pressure), which misreports plans that run in ~1s in a clean
    // session. An explicit GC lets the ContextCleaner drop dead broadcasts
    // promptly; clearCache covers anything a query left cached.
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }

    // 1-minute system load average (or -1 where unsupported): recorded at
    // start and end so a drifted total is attributable to machine state
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // Optional comma-separated filter for isolating queries when profiling
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val load0 = loadAvg()
    calibrate() // untimed: JIT-compile the probe loop itself
    tcalibrate() // untimed: JIT + one-time data fill for the parallel probe
    val calib0 = calibrate()
    val tcalib0 = tcalibrate()
    names.foreach { n => materialize(n, warmDir); hygiene() } // warmup, untimed
    // State pre-warm for the ambient-volatile class (see volatileClass):
    // one untimed TARGET-dir run builds their compute-if-absent scoped-tmp
    // state and touches its files, so no timed shot below carries the
    // one-time build — the same outside-the-timed-body placement as
    // hygiene()
    names.filter(volatileClass).foreach { n =>
      materialize(n, sfDir); hygiene()
    }
    // One timed (time, loadBefore) sample per query over the whole
    // catalog — the unit the pass-separated protocol composes.
    def passOver(qs: Seq[String]): Map[String, (Double, Double)] =
      qs.map { n =>
        val ld = loadAvg()
        val t = materialize(n, sfDir); hygiene()
        n -> (t, ld)
      }.toMap
    // Two whole-catalog passes put ~a full run length between each
    // query's samples (a transient host stall poisons at most one),
    // then an adaptive third pass covers the queries whose two shots
    // disagreed by >20% — where the min is still noise-dominated — AND
    // any query with a failed shot: a one-good-shot query is the
    // least-confirmed entry in the run (its "minimum" is a single
    // sample, possibly stall-inflated), and a both-failed query gets
    // one recovery chance before the -1 marker sticks.
    // The per-shot load samples land in the full artifact so a slow
    // entry can be attributed to ambient load, not a plan change.
    val calib1 = calibrate()
    val tcalib1 = tcalibrate()
    val p1 = passOver(names)
    val calib2 = calibrate()
    val tcalib2 = tcalibrate()
    val p2 = passOver(names)
    // Third-pass membership: the two-shot disagreement rule, any failed
    // shot, and — unconditionally — the ambient-volatile class, whose
    // same-code spread (1.40× measured) means two agreeing shots can
    // still both sit on a contended window; min-of-3 is the cheapest
    // estimator that beats it (three whole-catalog-separated samples)
    val unstable = names.filter { n =>
      val (a, _) = p1(n); val (b, _) = p2(n)
      volatileClass(n) ||
        a < 0 || b < 0 || math.abs(a - b) > 0.2 * math.min(a, b)
    }
    val calib3 = calibrate()
    val tcalib3 = tcalibrate()
    val p3 = passOver(unstable)
    val calibEnd = calibrate()
    val tcalibEnd = tcalibrate()
    val shots = names.map { n =>
      n -> (Seq(p1(n), p2(n)) ++ p3.get(n))
    }
    val results = shots.map { case (n, rs) => n -> best(rs.map(_._1)) }

    val sfName = new java.io.File(sfDir).getName
    // calib: the machine-speed probe timed pre-warmup, at the head of
    // each timed pass, and after the last pass — the host-drift
    // instrument bench_diff reads (see [[calibrate]]). tcalib: the
    // throughput-class probe timed at the same five brackets — the
    // second arbiter bench_diff consults when the single-thread probe
    // reads flat through a uniform shift (see [[tcalibrate]])
    val calibs = Seq(calib0, calib1, calib2, calib3, calibEnd)
    val tcalibs = Seq(tcalib0, tcalib1, tcalib2, tcalib3, tcalibEnd)
    // volatile: which of this run's entries got the de-noised protocol
    // (pre-warmed state + mandatory third shot) — recorded so a diff
    // tool can caveat the class's movements instead of flagging them
    val volat = names.filter(volatileClass)
      .map(n => s""""$n"""").mkString("[", ",", "]")
    val extra = s""","load":[${fmt(load0)},${fmt(loadAvg())}]""" +
      s""","calib":${calibs.map(fmt).mkString("[", ",", "]")}""" +
      s""","tcalib":${tcalibs.map(fmt).mkString("[", ",", "]")}""" +
      s""","volatile":$volat"""
    val out = renderLine(results, sfName, extra = extra)
    // Full-map artifact: every query's timing (plus both shots and the
    // per-query load trace) survives even though the stdout line drops
    // the fastest entries to fit the harness tail buffer. Best-effort —
    // the stdout contract must not break if the cwd is read-only.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "bench_full.json")
    val fullJson =
      renderFull(results, sfName, extra = extra + renderDetail(shots)) + "\n"
    // NonFatal, not just IOException: a malformed override path throws
    // InvalidPathException (a RuntimeException) from Paths.get, and
    // nothing may break the stdout contract below
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(fullPath), fullJson)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] full-map artifact write failed: $e")
    }
    // Round-stamped snapshot (bench_full_r<N>.json, N = max existing
    // BENCH_r<M>.json + 1): a commit-ready complete map beside the
    // round artifacts, so round-over-round diffs always compare like
    // against like (the r11 committed snapshot predated three queries).
    // Skipped silently when no BENCH_r files exist (dev runs outside
    // the repo root). Numbering semantics: BENCH_r<N> lands AFTER round
    // N's bench runs, so during round N the max is N-1 and the stamp
    // is N.
    // OPT-IN (round 14, closing the write-once rule's inverse risk):
    // stamping now requires SPARK_GRAFT_STAMP=1. First-writer-wins
    // write-once meant ANY first full run after a round closed —
    // including a throwaway or debug run — permanently claimed the
    // round file, and the later canonical quiet-window run only got a
    // stderr note; the committed snapshot could silently be the wrong
    // run. The stamp is a deliberate act now: run the canonical bench
    // with SPARK_GRAFT_STAMP=1 (the builder's round protocol, see
    // SCALE.md), every other run leaves only bench_full.json.
    // Never stamp a FILTERED run even when opted in: a
    // SPARK_GRAFT_QUERIES profiling run is a partial map, and stamping
    // it would clobber the committed complete snapshot with a 2-entry
    // file (happened once).
    // WRITE-ONCE still holds: never overwrite an existing
    // bench_full_r<N>.json — in round 12 a full rerun re-stamped the
    // same N and silently replaced the committed quiet-window snapshot
    // (115.9 s over 107.5 s). Opt-in narrows who stamps; write-once
    // keeps even opted-in reruns from clobbering. This also defuses
    // the mis-stamp risk of running from a cwd with stale or foreign
    // BENCH_r files: a wrong N can no longer clobber anything.
    try if (only.isEmpty) {
      val re = """BENCH_r(\d+)\.json""".r
      val rounds = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => re.unapplySeq(f.getName).map(_.head.toInt))
      if (rounds.nonEmpty) {
        if (!sys.env.get("SPARK_GRAFT_STAMP").contains("1"))
          // an operator following the pre-r14 default-on protocol gets
          // no bench_full_r<N>.json and, without this, no signal why —
          // mirror the write-once note (ADVICE r14)
          System.err.println("[bench] full run NOT round-stamped - set " +
            s"SPARK_GRAFT_STAMP=1 on the canonical quiet-window run to " +
            f"write bench_full_r${rounds.max + 1}%02d.json (full map is " +
            s"in $fullPath)")
        else {
          val stamp = java.nio.file.Paths.get(
            f"bench_full_r${rounds.max + 1}%02d.json")
          if (java.nio.file.Files.exists(stamp))
            System.err.println(s"[bench] round snapshot $stamp exists — " +
              "write-once, keeping the first stamp (full map is in " +
              s"$fullPath)")
          else java.nio.file.Files.writeString(stamp, fullJson)
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] round snapshot write failed: $e")
    }
    spark.stop()
    println(out) // LAST line of output — the harness parses exactly this
  }
}
