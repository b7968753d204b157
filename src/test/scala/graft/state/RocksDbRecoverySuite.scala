package graft.state

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Durability + the lenient recovery ladder under changelog checkpointing:
  * every commit writes a small changelog; full zip snapshots land on the
  * snapshot cadence (default every 5 commits); recovery = newest loadable
  * snapshot base + changelog replay, degrading through older bases to
  * empty — the reference's observable contracts
  * (RocksDbStateStoreProviderSuite.scala :25-117) preserved on the
  * amortized-upload design.
  */
class RocksDbRecoverySuite extends AnyFunSuite {
  import StateTestHelper._

  private def stateFiles(dir: String, prefix: String): Seq[Long] = {
    val stateDir = new File(s"$dir/0/0") // operator 0, partition 0
    if (!stateDir.exists()) Seq.empty
    else stateDir.listFiles().map(_.getName).toSeq
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toLong).sorted
  }

  test("every commit writes a durable changelog; zips land on the cadence") {
    val dir = Files.createTempDirectory("graft-snap").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    (0 until 7).foreach { v =>
      val s = p.getStore(v, None)
      put(s, "batch", v)
      assert(s.commit() === v + 1)
    }
    assert(stateFiles(dir, "state.changelog.") === (1L to 7L))
    assert(stateFiles(dir, "state.snapshot.") === Seq(5L)) // cadence = 5
    p.close()
  }

  test("cleanup: retention GC keeps a snapshot base + retained changelogs") {
    val dir = Files.createTempDirectory("graft-gc").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    (0 until 20).foreach { v =>
      val s = p.getStore(v, None)
      put(s, s"k$v", v)
      s.commit()
      p.doMaintenance()
    }
    // retention 3 → horizon 18; base snapshot 15 retained, older GC'd
    assert(stateFiles(dir, "state.snapshot.") === Seq(15L, 20L))
    assert(stateFiles(dir, "state.changelog.").forall(_ > 15L))
    // latest state intact…
    val s20 = p.getStore(20, None)
    assert(contents(s20).size === 20)
    s20.abort()
    // …and a mid-horizon version reconstructs from base + changelogs
    val s18 = p.getStore(18, None)
    assert(contents(s18).size === 18)
    s18.abort()
    p.close()
  }

  test("corrupted changelog degrades to the base; all-corrupt opens empty") {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    (0 until 6).foreach { v =>
      val s = p.getStore(v, None)
      put(s, "batch", v)
      s.commit()
    }
    p.close() // drop local snapshots: recovery must use the durable files

    // corrupt changelog 6: getStore(6) falls back to snapshot 5's state
    val p2 = initProvider(new RocksDbStateStoreProvider, dir)
    Files.write(new File(s"$dir/0/0/state.changelog.6").toPath, Array[Byte](1, 2, 3))
    val s6 = p2.getStore(6, None)
    assert(get(s6, "batch").contains(4)) // v5 holds batch=4
    s6.abort()
    p2.close()

    // corrupt the snapshot AND all changelogs: opens empty, never throws
    val p3 = initProvider(new RocksDbStateStoreProvider, dir)
    Files.write(new File(s"$dir/0/0/state.snapshot.5").toPath, Array[Byte](9))
    (1 to 6).foreach { v =>
      Files.write(new File(s"$dir/0/0/state.changelog.$v").toPath, Array[Byte](9))
    }
    val sEmpty = p3.getStore(6, None)
    assert(contents(sEmpty).isEmpty)
    sEmpty.abort()
    p3.close()
  }

  test("restart recovery from durable artifacts alone (changelogs, no zip yet)") {
    val dir = Files.createTempDirectory("graft-restart").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    val s0 = p.getStore(0, None)
    (1 to 50).foreach(i => put(s0, s"k$i", i))
    s0.commit() // version 1: below the zip cadence → changelog only
    p.close()   // simulates executor death: local dirs gone

    val p2 = initProvider(new RocksDbStateStoreProvider, dir)
    val s1 = p2.getStore(1, None)
    assert(contents(s1).size === 50)
    assert(get(s1, "k37").contains(37))
    s1.abort()
    p2.close()
  }
}
