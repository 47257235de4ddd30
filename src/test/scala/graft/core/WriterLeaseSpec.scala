package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WriterLease: concurrent cooperating writers serialize and ALL complete
  * (the detect-and-abort guards alone make one of them lose), stale leases
  * are stolen, and a lost lease fails loudly at release.
  */
class WriterLeaseSpec extends SparkSpec {
  import spark.implicits._

  test("two concurrent upserts with serializeWriters both complete") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"lease_${System.nanoTime()}"))
    store.save(spark.range(10).select($"id", $"id".as("v")), "dim", "t")
    // Each writer stalls in its beforeSwap seam long enough to overlap the
    // other's merge window — without the lease one would read a target the
    // other is about to swap and trip the quiesce guard.
    def writer(lo: Long, hi: Long): Thread = {
      val t = new Thread(() =>
        store.upsert(
          spark.range(lo, hi).select($"id", lit(-lo).as("v")),
          "dim", "t", Seq("id"),
          beforeSwap = () => Thread.sleep(300),
          serializeWriters = true))
      t.start(); t
    }
    val (w1, w2) = (writer(100, 105), writer(200, 205))
    w1.join(120000); w2.join(120000)
    assert(!w1.isAlive && !w2.isAlive, "writers must finish")
    val got = store.load("dim", "t").as[(Long, Long)].collect().toMap
    val expected = (0L until 10L).map(i => i -> i).toMap ++
      (100L until 105L).map(i => i -> -100L).toMap ++
      (200L until 205L).map(i => i -> -200L).toMap
    assert(got == expected, "both batches must be published")
  }

  test("upsert and compaction queue on the same per-table lock") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"leasec_${System.nanoTime()}"))
    store.save(spark.range(20).select($"id", $"id".as("v"))
      .repartition(8), "dim", "t")
    val fqn = store.fqn("dim", "t")
    val c = new Thread(() => Compaction.compactTable(spark, fqn,
      targetRows = 100, beforeSwap = () => Thread.sleep(300),
      serializeWriters = true))
    c.start()
    Thread.sleep(50) // let compaction take the lease first
    store.upsert(spark.range(20, 22).select($"id", lit(99L).as("v")),
      "dim", "t", Seq("id"), serializeWriters = true)
    c.join(120000)
    assert(!c.isAlive, "compaction must finish")
    assert(store.load("dim", "t").count() == 22)
    assert(store.load("dim", "t").filter($"v" === 99L).count() == 2)
  }

  test("two partition compactions with serializeWriters both complete") {
    val store = new TableStore(spark, PipelineConfig(
      catalog = "graftc", schema = s"leasep_${System.nanoTime()}"))
    store.savePartitioned(spark.range(40)
      .select($"id", ($"id" * 10).as("v"), ($"id" % 2).as("p"))
      .repartition(8), "fact", "t", Seq("p"))
    val fqn = store.fqn("fact", "t")
    // disjoint slices, but both stage into the shared __compact name —
    // unserialized they can clobber each other's stage; leased they queue
    def compactor(pred: String): Thread = {
      val t = new Thread(() => Compaction.compactPartitions(spark, fqn,
        pred, targetRows = 100, afterStage = () => Thread.sleep(300),
        serializeWriters = true))
      t.start(); t
    }
    val (c0, c1) = (compactor("p = 0"), compactor("p = 1"))
    c0.join(120000); c1.join(120000)
    assert(!c0.isAlive && !c1.isAlive, "both compactions must finish")
    assert(store.load("fact", "t").count() == 40)
    assert(spark.table(fqn).inputFiles.count(_.contains("p=0")) == 1)
    assert(spark.table(fqn).inputFiles.count(_.contains("p=1")) == 1)
  }

  test("a lease lost mid-operation fails loudly at release") {
    val name = s"lease_lost_${System.nanoTime()}"
    val ex = intercept[IllegalStateException] {
      WriterLease.withLock(spark, name, leaseMs = 200L, waitMs = 0L) {
        // simulate expiry mid-operation: age the marker past the lease and
        // let a contender steal it (and finish, clearing the marker)
        val path = WriterLease.lockPath(spark, name)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.setTimes(path, System.currentTimeMillis() - 1000L, -1)
        val thief = new Thread(() =>
          WriterLease.withLock(spark, name, leaseMs = 200L,
            waitMs = 10000L)(()))
        thief.start(); thief.join(30000)
        assert(!thief.isAlive)
      }
    }
    assert(ex.getMessage.contains("lost"),
      s"release after a stolen lease must fail loudly, got: ${ex.getMessage}")
  }

  test("N contenders on a stale lease: exactly one wins the steal") {
    val name = s"lease_race_${System.nanoTime()}"
    val path = WriterLease.lockPath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, false)
    out.write("dead-holder".getBytes("UTF-8")); out.close()
    fs.setTimes(path, System.currentTimeMillis() - 60000L, -1) // abandoned
    // 8 contenders, zero queue patience: the tombstone rename hands the
    // steal to exactly one; everyone re-races the create, exactly one
    // acquires (kernel O_EXCL on the local scheme) and holds until
    // released below — the other 7 hit their waitMs=0 deadline and throw.
    val gate = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val losses = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() =>
        try WriterLease.withLock(spark, name, leaseMs = 60000L,
          waitMs = 0L) { wins.incrementAndGet(); gate.await() }
        catch { case _: IllegalStateException => losses.incrementAndGet() })
      t.start(); t
    }
    val deadline = System.currentTimeMillis() + 30000L
    while (wins.get + losses.get < 8 &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(wins.get == 1, s"exactly one steal winner, got ${wins.get}")
    assert(losses.get == 7, s"7 losers, got ${losses.get}")
    gate.countDown()
    threads.foreach(_.join(30000))
    assert(threads.forall(!_.isAlive))
    assert(!fs.exists(path), "winner's release must clear the marker")
  }

  test("two writers racing the SAME stale lease with queue patience: " +
      "exactly one steals, the other QUEUES behind it — never two " +
      "concurrent holders (r19 verdict item 5)") {
    // The N-contender test above pins one-winner with waitMs=0 (losers
    // give up). The production shape is waitMs>0: the steal loser must
    // fall back into the normal polling queue and run AFTER the winner
    // — mutual exclusion through the whole steal-then-queue sequence.
    val name = s"lease_squeue_${System.nanoTime()}"
    val path = WriterLease.lockPath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, false)
    out.write("dead-holder".getBytes("UTF-8")); out.close()
    fs.setTimes(path, System.currentTimeMillis() - 60000L, -1) // abandoned
    val holders = new java.util.concurrent.atomic.AtomicInteger
    val maxHolders = new java.util.concurrent.atomic.AtomicInteger
    val completions = new java.util.concurrent.atomic.AtomicInteger
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 2).map { _ =>
      val t = new Thread(() =>
        try WriterLease.withLock(spark, name, leaseMs = 60000L,
          waitMs = 30000L) {
          val h = holders.incrementAndGet()
          maxHolders.updateAndGet(m => math.max(m, h))
          Thread.sleep(250) // hold long enough for overlap to show
          holders.decrementAndGet()
          completions.incrementAndGet()
        } catch { case e: Throwable => errs.add(e) })
      t.start(); t
    }
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive), "steal-then-queue pair deadlocked")
    assert(errs.isEmpty, s"both must complete, got $errs")
    assert(completions.get == 2, s"both must run, got ${completions.get}")
    assert(maxHolders.get == 1,
      s"two concurrent holders observed (max=${maxHolders.get}) — " +
        "mutual exclusion violated in the steal window")
    assert(!fs.exists(path), "last release must clear the marker")
  }

  test("release failure after f threw is suppressed, not a replacement") {
    val name = s"lease_supp_${System.nanoTime()}"
    val path = WriterLease.lockPath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ex = intercept[RuntimeException] {
      WriterLease.withLock(spark, name, leaseMs = 60000L, waitMs = 0L) {
        fs.delete(path, false) // simulate the marker vanishing mid-op
        throw new RuntimeException("the operation's own failure")
      }
    }
    // the root cause survives; the lost-lease release failure rides along
    assert(ex.getMessage == "the operation's own failure")
    assert(ex.getSuppressed.exists(s =>
      s.isInstanceOf[IllegalStateException] &&
        s.getMessage.contains("lost")),
      s"release failure must be suppressed, got ${ex.getSuppressed.toSeq}")
  }

  test("a stale lease is stolen; a live one times out") {
    val name = s"lease_unit_${System.nanoTime()}"
    val path = WriterLease.lockPath(spark, name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, false)
    out.write("dead-holder".getBytes("UTF-8")); out.close()
    // live lease: a waiter with waitMs=0 gives up loudly
    val ex = intercept[IllegalStateException] {
      WriterLease.withLock(spark, name, leaseMs = 60000L, waitMs = 0L)(())
    }
    assert(ex.getMessage.contains("timed out"))
    // age the marker past the lease: the next contender steals and runs
    fs.setTimes(path, System.currentTimeMillis() - 10000L, -1)
    var ran = false
    WriterLease.withLock(spark, name, leaseMs = 1000L, waitMs = 5000L) {
      ran = true
    }
    assert(ran && !fs.exists(path), "steal must run f and clear the marker")
  }
}
