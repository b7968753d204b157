package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** TTL truth table with an injectable clock — pins the semantics the
  * reference establishes in RocksDbStateTimeoutSuite.scala:
  *  -1 never expires; 0 is stateless; n expires after n seconds of
  *  INACTIVITY with the deadline reset by reads and writes; per-query
  *  overrides resolve via the checkpoint path's query name.
  */
class StateTtlSuite extends AnyFunSuite with BeforeAndAfterEach {
  import StateTestHelper._

  private var clock: FakeTtlClock = _

  override def beforeEach(): Unit = {
    clock = new FakeTtlClock
    GraftStateStoreProviderBase.clockOverride = Some(clock)
  }
  override def afterEach(): Unit =
    GraftStateStoreProviderBase.clockOverride = None

  private def providerWithTtl(ttlSecs: Long, queryName: String = "q1"): InMemoryStateStoreProvider = {
    val dir = Files.createTempDirectory("graft-ttl").toString + s"/$queryName/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.$queryName" -> ttlSecs.toString,
      TtlConf.StrictKey -> "true"))
    initProvider(new InMemoryStateStoreProvider, dir, conf)
  }

  test("ttl=-1: state never expires") {
    val p = providerWithTtl(-1)
    val s = p.getStore(0, None)
    put(s, "k1", 1)
    clock.advanceSecs(1000000L)
    assert(get(s, "k1").contains(1))
    assert(contents(s) === Map("k1" -> 1))
    s.commit(); p.close()
  }

  test("ttl=0: stateless — puts are immediately invisible") {
    val p = providerWithTtl(0)
    val s = p.getStore(0, None)
    put(s, "k1", 1)
    assert(get(s, "k1").isEmpty)
    assert(contents(s).isEmpty)
    s.commit(); p.close()
  }

  test("ttl=n: expires after n seconds of inactivity") {
    val p = providerWithTtl(3)
    val s = p.getStore(0, None)
    put(s, "k1", 1)
    clock.advanceSecs(2)
    assert(get(s, "k1").contains(1)) // alive at 2s
    clock.advanceSecs(4)             // 4s since last ACCESS (the get reset it)
    assert(get(s, "k1").isEmpty)
    assert(contents(s).isEmpty)
    s.commit(); p.close()
  }

  test("ttl=n: deadline resets on read and update") {
    val p = providerWithTtl(3)
    val s = p.getStore(0, None)
    put(s, "k1", 1)
    // keep touching every 2s — stays alive past 3s total age
    (1 to 5).foreach { _ =>
      clock.advanceSecs(2)
      assert(get(s, "k1").contains(1))
    }
    // update also resets
    clock.advanceSecs(2)
    put(s, "k1", 2)
    clock.advanceSecs(2)
    assert(get(s, "k1").contains(2))
    // then let it die
    clock.advanceSecs(4)
    assert(get(s, "k1").isEmpty)
    s.commit(); p.close()
  }

  test("expired entries are physically dropped at commit") {
    val p = providerWithTtl(3)
    val s = p.getStore(0, None)
    put(s, "dead", 1); put(s, "alive", 2)
    clock.advanceSecs(4)
    put(s, "alive", 3) // reset 'alive' only
    assert(s.commit() === 1)
    val s1 = p.getStore(1, None)
    // 'dead' was swept at commit; 'alive' survived
    assert(contents(s1) === Map("alive" -> 3))
    s1.abort(); p.close()
  }

  test("per-query TTL overrides resolve independently via checkpoint path") {
    val root = Files.createTempDirectory("graft-ttl-multi").toString
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.qa" -> "2",
      s"${TtlConf.ExpiryKey}.qb" -> "100",
      TtlConf.ExpiryKey -> "-1",
      TtlConf.StrictKey -> "true"))
    val pa = initProvider(new InMemoryStateStoreProvider, s"$root/qa/state", conf)
    val pb = initProvider(new InMemoryStateStoreProvider, s"$root/qb/state", conf)
    val pc = initProvider(new InMemoryStateStoreProvider, s"$root/unconfigured/state", conf)
    val (sa, sb, sc) = (pa.getStore(0, None), pb.getStore(0, None), pc.getStore(0, None))
    put(sa, "k", 1); put(sb, "k", 1); put(sc, "k", 1)
    clock.advanceSecs(5)
    assert(get(sa, "k").isEmpty)      // qa: 2s TTL → gone
    assert(get(sb, "k").contains(1))  // qb: 100s TTL → alive
    assert(get(sc, "k").contains(1))  // unconfigured query → global -1
    Seq(sa, sb, sc).foreach(_.abort())
    Seq(pa, pb, pc).foreach(_.close())
  }

  test("queryName recovery from checkpoint path") {
    assert(TtlConf.queryNameFromCheckpoint("/tmp/ckpt/myquery/state") === "myquery")
    assert(TtlConf.queryNameFromCheckpoint("/tmp/ckpt/myquery") === "myquery")
    assert(TtlConf.queryNameFromCheckpoint("/state") === TtlConf.UnnamedQuery)
  }
}
