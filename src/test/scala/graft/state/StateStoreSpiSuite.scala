package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.state.StateStore

/** SPI-contract tests run against BOTH providers (the reference only covers
  * RocksDB at this level — SURVEY.md §5 upgrades that).
  */
abstract class StateStoreSpiSuiteBase extends AnyFunSuite {
  import StateTestHelper._

  def makeProvider(checkpointDir: String): GraftStateStoreProviderBase
  def providerName: String

  private def freshProvider(): GraftStateStoreProviderBase = {
    val dir = Files.createTempDirectory(s"graft-spi-$providerName").toString
    makeProvider(dir)
  }

  test(s"$providerName: put/get/remove round-trip and versioning") {
    val p = freshProvider()
    val s0 = p.getStore(0, None)
    assert(get(s0, "a").isEmpty)
    put(s0, "a", 1); put(s0, "b", 2)
    assert(get(s0, "a").contains(1))
    assert(s0.commit() === 1)
    assert(s0.hasCommitted)

    // reopen at 1 sees committed data; remove is transactional
    val s1 = p.getStore(1, None)
    assert(get(s1, "a").contains(1))
    assert(get(s1, "b").contains(2))
    remove(s1, "a"); put(s1, "b", 20)
    assert(s1.commit() === 2)

    val s2 = p.getStore(2, None)
    assert(get(s2, "a").isEmpty)
    assert(get(s2, "b").contains(20))
    s2.abort()

    // old version still recoverable (task-retry contract)
    val s1again = p.getStore(1, None)
    assert(contents(s1again) === Map("a" -> 1, "b" -> 2))
    s1again.abort()
    p.close()
  }

  test(s"$providerName: abort discards updates") {
    val p = freshProvider()
    val s0 = p.getStore(0, None)
    put(s0, "a", 1)
    assert(s0.commit() === 1)
    val s1 = p.getStore(1, None)
    put(s1, "a", 99); put(s1, "zz", 100)
    s1.abort()
    assert(!s1.hasCommitted)
    val s1b = p.getStore(1, None)
    assert(contents(s1b) === Map("a" -> 1))
    s1b.abort()
    p.close()
  }

  test(s"$providerName: negative version rejected") {
    val p = freshProvider()
    intercept[IllegalArgumentException](p.getStore(-1, None))
    p.close()
  }

  test(s"$providerName: iterator reflects uncommitted updates in open store") {
    val p = freshProvider()
    val s0 = p.getStore(0, None)
    (1 to 100).foreach(i => put(s0, s"k$i", i))
    assert(contents(s0).size === 100)
    assert(contents(s0)("k37") === 37)
    s0.commit()
    p.close()
  }

  test(s"$providerName: metrics reports keys and memory") {
    val p = freshProvider()
    val s0 = p.getStore(0, None)
    put(s0, "a", 1)
    put(s0, "b", 2)
    val m = s0.metrics
    assert(m.numKeys === 2)
    assert(m.memoryUsedBytes > 0)
    s0.commit()
    // commit-durability custom metric is declared and reported post-commit
    assert(p.supportedCustomMetrics.exists(_.name == "snapshotDurabilityMs"))
    assert(s0.metrics.customMetrics.keys.exists(_.name == "snapshotDurabilityMs"))
    p.close()
  }

  test(s"$providerName: maintenance retains only minVersionsToRetain versions") {
    val p = freshProvider()
    (0 until 10).foreach { v =>
      val s = p.getStore(v, None)
      put(s, "batch", v)
      assert(s.commit() === v + 1)
      p.doMaintenance()
    }
    // retention = 3 (helper default) → 8, 9, 10 survive
    val latest = p.getStore(10, None)
    assert(get(latest, "batch").contains(9))
    latest.abort()
    // a GC'd version follows the lenient ladder, never failing: backends
    // without a reachable base open empty; the RocksDB backend may still
    // reconstruct version 5 exactly (retained snapshot base + changelogs),
    // in which case the data must be version 5's (batch=4)
    val old = p.getStore(5, None)
    assert(get(old, "batch").forall(_ == 4))
    old.abort()
    p.close()
  }

  test(s"$providerName: read store lifecycle — getReadStore, release, write upgrade") {
    val p = freshProvider()
    val s0 = p.getStore(0, None)
    put(s0, "a", 1); put(s0, "b", 2)
    assert(s0.commit() === 1)

    // read-only view; partial scan then release (no drain required)
    val r = p.getReadStore(1, None)
    assert(get(r, "a").contains(1))
    val it = r.iterator()
    assert(it.hasNext); it.next()
    r.release()

    // read → write upgrade: Spark's restore-then-save pattern
    // (StateStoreRestoreExec reads, StateStoreSaveExec upgrades + writes)
    val r2 = p.getReadStore(1, None)
    assert(get(r2, "b").contains(2))
    val w = p.upgradeReadStoreToWriteStore(r2, 1, None)
    put(w, "c", 3)
    assert(w.commit() === 2)
    val s2 = p.getStore(2, None)
    assert(contents(s2) === Map("a" -> 1, "b" -> 2, "c" -> 3))
    s2.abort()

    // release() mid-update on a WRITE store must discard like abort
    val s3 = p.getStore(2, None)
    put(s3, "junk", 9)
    s3.release()
    assert(!s3.hasCommitted)
    val s3b = p.getStore(2, None)
    assert(get(s3b, "junk").isEmpty)
    s3b.abort()
    p.close()
  }

  test(s"$providerName: multi-value merge + valuesIterator") {
    val dir = Files.createTempDirectory(s"graft-mv-$providerName").toString
    val p = makeProvider(dir)
    // re-init with multi-value on
    initProvider(p, dir, multiValue = true)
    val s = p.getStore(0, None)
    val k = keyRow("mk")
    s.put(k, valueRow(1), StateStore.DEFAULT_COL_FAMILY_NAME)
    s.merge(k, valueRow(2), StateStore.DEFAULT_COL_FAMILY_NAME)
    s.merge(k, valueRow(3), StateStore.DEFAULT_COL_FAMILY_NAME)
    val vs = s.valuesIterator(k, StateStore.DEFAULT_COL_FAMILY_NAME).map(valueOf).toList
    assert(vs === List(1, 2, 3))
    // get returns the first value for multi-value stores
    assert(get(s, "mk").contains(1))
    s.commit()
    p.close()
  }
}

class InMemorySpiSuite extends StateStoreSpiSuiteBase {
  import StateTestHelper._
  override def providerName = "inmemory"
  override def makeProvider(dir: String): GraftStateStoreProviderBase =
    initProvider(new InMemoryStateStoreProvider, dir)
}

class RocksDbSpiSuite extends StateStoreSpiSuiteBase {
  import StateTestHelper._
  override def providerName = "rocksdb"
  override def makeProvider(dir: String): GraftStateStoreProviderBase =
    initProvider(new RocksDbStateStoreProvider, dir)
}

class KvSpiSuite extends StateStoreSpiSuiteBase {
  import StateTestHelper._
  override def providerName = "kv"
  override def makeProvider(dir: String): GraftStateStoreProviderBase =
    initProvider(new KvStateStoreProvider, dir)
}
