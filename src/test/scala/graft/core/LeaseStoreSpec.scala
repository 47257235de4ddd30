package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The lock protocol against a NON-filesystem [[WriterLease.LeaseStore]]:
  * an in-memory conditional-put store standing in for a DynamoDB/
  * ZooKeeper/database backend. Proves the protocol (acquire, queue,
  * steal, loud lost-lease release) is backend-agnostic — the object-store
  * deployment plugs in a real coordination service without touching
  * WriterLease or its callers — and exercises the core loop with zero
  * Spark/Hadoop machinery.
  */
class LeaseStoreSpec extends AnyFunSuite {

  /** Conditional-put semantics: atomicity from one monitor, like a
    * single-row CAS. `clock` is controllable so staleness is tested
    * without sleeping out a lease.
    */
  final class MemStore(clock: () => Long) extends WriterLease.LeaseStore {
    private val rows =
      scala.collection.mutable.Map.empty[String, (String, Long)]
    def createExclusive(key: String, token: String): Boolean =
      synchronized {
        if (rows.contains(key)) false
        else { rows(key) = (token, clock()); true }
      }
    def readToken(key: String): Option[String] =
      synchronized(rows.get(key).map(_._1))
    def modificationTime(key: String): Option[Long] =
      synchronized(rows.get(key).map(_._2))
    def rename(key: String, toKey: String): Boolean = synchronized {
      rows.remove(key) match {
        case Some(v) => rows(toKey) = v; true
        case None => false
      }
    }
    def delete(key: String): Unit = synchronized(rows.remove(key))
    def deleteIfToken(key: String, token: String): Boolean = synchronized {
      if (rows.get(key).exists(_._1 == token)) { rows.remove(key); true }
      else false
    }
    def ageMarker(key: String, byMs: Long): Unit = synchronized {
      rows.get(key).foreach { case (t, m) => rows(key) = (t, m - byMs) }
    }
    def size: Int = synchronized(rows.size)
  }

  test("acquire/release round-trips and serializes two contenders") {
    val store = new MemStore(() => System.currentTimeMillis())
    var inside = 0
    var maxInside = 0
    def job(): Unit =
      WriterLease.withLock(store, "t1", leaseMs = 60000L, waitMs = 30000L) {
        synchronized { inside += 1; maxInside = math.max(maxInside, inside) }
        Thread.sleep(100)
        synchronized { inside -= 1 }
      }
    val threads = (1 to 4).map { _ =>
      val t = new Thread(() => job()); t.start(); t
    }
    threads.foreach(_.join(30000))
    assert(threads.forall(!_.isAlive))
    assert(maxInside == 1, "mutual exclusion must hold on the mem store")
    assert(store.size == 0, "all markers released")
  }

  test("a stale marker is stolen through the store's rename; a live one " +
    "times out") {
    val store = new MemStore(() => System.currentTimeMillis())
    assert(store.createExclusive("t2", "dead-holder"))
    val e = intercept[IllegalStateException] {
      WriterLease.withLock(store, "t2", leaseMs = 60000L, waitMs = 0L)(())
    }
    assert(e.getMessage.contains("timed out"))
    assert(e.getMessage.contains("dead-holder"))
    store.ageMarker("t2", 10000L)
    var ran = false
    WriterLease.withLock(store, "t2", leaseMs = 1000L, waitMs = 5000L) {
      ran = true
    }
    assert(ran && store.size == 0)
  }

  test("lost lease fails loudly at release; after f threw it is suppressed") {
    val store = new MemStore(() => System.currentTimeMillis())
    val lost = intercept[IllegalStateException] {
      WriterLease.withLock(store, "t3", leaseMs = 60000L, waitMs = 0L) {
        store.delete("t3") // thief took over and finished
      }
    }
    assert(lost.getMessage.contains("lost"))
    val own = intercept[RuntimeException] {
      WriterLease.withLock(store, "t3", leaseMs = 60000L, waitMs = 0L) {
        store.delete("t3")
        throw new RuntimeException("op failed")
      }
    }
    assert(own.getMessage == "op failed")
    assert(own.getSuppressed.exists(_.getMessage.contains("lost")))
  }
}
