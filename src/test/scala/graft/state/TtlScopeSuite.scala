package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.state.{NoPrefixKeyStateEncoderSpec, StateStore}

/** Scope and hygiene of the global inactivity TTL:
  *  - it governs the DEFAULT column family only — operator-internal CFs
  *    (transformWithState timers etc.) are only ever observed via
  *    iterator(), so expire-after-access there would silently drop any
  *    timer idle longer than the TTL (it would simply never fire);
  *  - a read-only isExpired probe must not perturb the touch order the
  *    commit sweep relies on (an expired key probed during iteration must
  *    still be swept);
  *  - stateless mode (ttl 0) must physically drop its writes at commit,
  *    not just hide them (a "stateless" query whose snapshots grow
  *    forever is a storage leak).
  */
class TtlScopeSuite extends AnyFunSuite with BeforeAndAfterEach {
  import StateTestHelper._

  private var clock: FakeTtlClock = _

  override def beforeEach(): Unit = {
    clock = new FakeTtlClock
    GraftStateStoreProviderBase.clockOverride = Some(clock)
  }
  override def afterEach(): Unit =
    GraftStateStoreProviderBase.clockOverride = None

  private def providerWithTtl(ttlSecs: Long): InMemoryStateStoreProvider = {
    val dir = Files.createTempDirectory("graft-ttlscope").toString + "/q1/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.q1" -> ttlSecs.toString,
      TtlConf.StrictKey -> "true"))
    initProvider(new InMemoryStateStoreProvider, dir, conf)
  }

  test("non-default column families are exempt from the global TTL") {
    val p = providerWithTtl(3)
    val s = p.getStore(0, None)
    s.createColFamilyIfAbsent("$procTimers", keySchema, valueSchema,
      NoPrefixKeyStateEncoderSpec(keySchema), useMultipleValuesPerKey = false,
      isInternal = true)
    put(s, "user-key", 1)
    s.put(keyRow("timer-1"), valueRow(99), "$procTimers")
    clock.advanceSecs(100) // far past the 3 s TTL, nothing re-touched
    // the user key expires...
    assert(get(s, "user-key").isEmpty)
    // ...but the timer is still there for BOTH access paths — a dropped
    // timer would never fire
    assert(Option(s.get(keyRow("timer-1"), "$procTimers")).map(valueOf).contains(99))
    val it = s.iterator("$procTimers")
    assert(it.toSeq.size === 1)
    s.commit()
    // and the sweep at commit did not remove it either
    val s1 = p.getStore(1, None)
    assert(Option(s1.get(keyRow("timer-1"), "$procTimers")).map(valueOf).contains(99))
    s1.abort(); p.close()
  }

  test("iterator probes do not reorder the sweep's oldest-first index") {
    val p = providerWithTtl(3)
    val s = p.getStore(0, None)
    put(s, "old", 1)           // touched at t=0
    clock.advanceSecs(2)
    put(s, "fresh", 2)         // touched at t=2
    // read-only probe of 'old' via iterator at t=2 (alive, but the probe
    // itself must not move 'old' behind 'fresh' in the touch order)
    assert(contents(s).keySet === Set("old", "fresh"))
    clock.advanceSecs(2)       // t=4: old idle 4 s (expired), fresh idle 2 s
    s.commit()                 // sweep walks oldest-first
    val s1 = p.getStore(1, None)
    // 'old' was physically swept despite the earlier probe; 'fresh' kept.
    // (Without the insertion-order tracker fix the sweep would stop at
    // 'fresh' first and retain expired 'old' forever.)
    assert(contents(s1) === Map("fresh" -> 2))
    s1.abort(); p.close()
  }

  test("stateless mode physically drops its writes at commit") {
    val p = providerWithTtl(0)
    val s = p.getStore(0, None)
    put(s, "a", 1); put(s, "b", 2)
    assert(contents(s).isEmpty) // invisible, per the reference truth table
    s.commit()
    // and GONE from storage: a fresh store over version 1 holds nothing
    // even through the raw metrics (no hidden rows accreting per batch)
    val s1 = p.getStore(1, None)
    assert(s1.metrics.numKeys === 0)
    assert(contents(s1).isEmpty)
    s1.abort(); p.close()
  }

  test("non-strict TTL on a backend without storage-level expiry still expires") {
    val dir = Files.createTempDirectory("graft-ttlscope").toString + "/q1/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.q1" -> "3",
      TtlConf.StrictKey -> "false")) // would be a silent no-op pre-upgrade
    val p = initProvider(new InMemoryStateStoreProvider, dir, conf)
    val s = p.getStore(0, None)
    put(s, "k", 1)
    clock.advanceSecs(10)
    assert(get(s, "k").isEmpty, "state configured to expire lived forever")
    s.commit(); p.close()
  }
}
