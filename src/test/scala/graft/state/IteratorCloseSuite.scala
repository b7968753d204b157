package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Scan-iterator lifecycle over the RocksDB backend: a partially-consumed
  * store iterator must not leak its native RocksIterator (closing a
  * RocksDB with live native iterators can crash the JVM), and the
  * committed-store read path must never mutate the live DB.
  */
class IteratorCloseSuite extends AnyFunSuite {
  import StateTestHelper._

  test("partially-consumed iterator: explicit close, commit/abort also close") {
    val dir = Files.createTempDirectory("graft-iterclose").toString + "/q/state"
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    val s0 = p.getStore(0, None)
    (1 to 10).foreach(i => put(s0, s"k$i", i))
    s0.commit()

    // explicit close mid-scan
    val s1 = p.getStore(1, None)
    val it = s1.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
    assert(it.hasNext); it.next(); it.next()
    it.close()
    it.close() // idempotent

    // un-closed partial scan: commit() must close it before sealing
    val it2 = s1.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
    assert(it2.hasNext); it2.next()
    s1.commit()

    // un-closed partial scan live at abort(): abort must close it so the
    // backend can drop the DB safely
    val s2 = p.getStore(2, None)
    val it3 = s2.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
    assert(it3.hasNext); it3.next()
    put(s2, "dirty", 1) // make the session dirty so abort invalidates the DB
    s2.abort()

    p.close() // no native iterator may survive to here
  }

  test("strict-TTL read on a Committed store returns null without mutating") {
    val clock = new FakeTtlClock
    GraftStateStoreProviderBase.clockOverride = Some(clock)
    try {
      val dir = Files.createTempDirectory("graft-committedread").toString + "/q/state"
      val conf = storeConf(extra = Map(s"${TtlConf.ExpiryKey}.q" -> "10"))
      val p = initProvider(new RocksDbStateStoreProvider, dir, conf)
      val s0 = p.getStore(0, None)
      put(s0, "k", 7)
      s0.commit()
      val s1 = p.getStore(1, None)
      assert(get(s1, "k").contains(7))
      s1.commit() // s1 is now Committed; its changelog is sealed

      clock.advanceSecs(100)
      // expired read on the sealed store: must report gone...
      assert(get(s1, "k").isEmpty)
      // ...but must NOT have deleted the row from the live DB (the old bug
      // wrote a post-seal delete that diverged the DB from its changelog).
      // Rewinding the clock makes the tracker entry fresh again: the value
      // must still be physically present.
      clock.advanceSecs(-100)
      val s2 = p.getStore(2, None)
      assert(get(s2, "k").contains(7))
      s2.abort()
      p.close()
    } finally GraftStateStoreProviderBase.clockOverride = None
  }
}
