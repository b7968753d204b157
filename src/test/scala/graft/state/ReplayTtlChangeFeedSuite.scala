package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.state.{RecordType, StateStore}

/** Historical reads must be insulated from the LIVE query's TTL state, and
  * the change feed must not lose ListState elements.
  */
class ReplayTtlChangeFeedSuite extends AnyFunSuite with BeforeAndAfterEach {
  import StateTestHelper._

  private var clock: FakeTtlClock = _

  override def beforeEach(): Unit = {
    clock = new FakeTtlClock
    GraftStateStoreProviderBase.clockOverride = Some(clock)
  }
  override def afterEach(): Unit =
    GraftStateStoreProviderBase.clockOverride = None

  test("snapshot replay under a live strict TTL returns history, not TTL holes") {
    val dir = Files.createTempDirectory("graft-replayttl").toString + "/q1/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.q1" -> "3",
      TtlConf.StrictKey -> "true"))
    val p = initProvider(new RocksDbStateStoreProvider, dir, conf)
    val s0 = p.getStore(0, None)
    put(s0, "k", 7)
    assert(s0.commit() === 1)

    clock.advanceSecs(100) // the LIVE query now considers k expired
    val live = p.getStore(1, None)
    assert(get(live, "k").isEmpty, "fixture: live read should see expiry")
    live.abort()

    // replay answers "what did history look like at version 1": the value
    // must be there, and the read must not try to delete from (and crash
    // on) the read-only replay session
    val replay = p.replayStateFromSnapshot(0, 1, readOnly = true, None, None)
    assert(get(replay, "k").contains(7))
    assert(contents(replay) === Map("k" -> 7))
    replay.abort()
    p.close()
  }

  test("change feed emits one record per merged ListState element") {
    val dir = Files.createTempDirectory("graft-cfmv").toString + "/q1/state"
    val p = initProvider(new RocksDbStateStoreProvider, dir, multiValue = true)
    val s = p.getStore(0, None)
    val k = keyRow("mk")
    s.put(k, valueRow(1), StateStore.DEFAULT_COL_FAMILY_NAME)
    s.merge(k, valueRow(2), StateStore.DEFAULT_COL_FAMILY_NAME)
    s.merge(k, valueRow(3), StateStore.DEFAULT_COL_FAMILY_NAME)
    assert(s.commit() === 1)

    val records = p.getStateStoreChangeDataReader(1, 1, None, None).toList
    // the changelog's last write for the key carries the whole 3-element
    // blob; the feed must surface all three values, not just the first
    val puts = records.filter(_._1 == RecordType.PUT_RECORD)
    val values = puts.map(r => valueOf(r._3))
    assert(values.takeRight(3) === List(1, 2, 3),
      s"expected the final merge's 3 elements, got $values")
    p.close()
  }
}
