package graft.state

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Snapshot durability + the lenient recovery ladder — the observable
  * contracts the reference pins in RocksDbStateStoreProviderSuite.scala:
  * snapshots exist per version (:25-67), GC retains the last
  * `minVersionsToRetain` (:69-88), corrupted snapshots silently degrade to
  * the next-older version and ultimately to empty (:90-117).
  */
class RocksDbRecoverySuite extends AnyFunSuite {
  import StateTestHelper._

  private def snapshotFiles(dir: String): Seq[String] = {
    val stateDir = new File(s"$dir/0/0") // operator 0, partition 0
    if (!stateDir.exists()) Seq.empty
    else stateDir.listFiles().map(_.getName).toSeq.filter(_.startsWith("state.snapshot."))
  }

  test("snapshotting: every commit produces a durable snapshot file") {
    val dir = Files.createTempDirectory("graft-snap").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    (0 until 5).foreach { v =>
      val s = p.getStore(v, None)
      put(s, "batch", v)
      assert(s.commit() === v + 1)
    }
    val files = snapshotFiles(dir)
    assert((1 to 5).forall(v => files.contains(s"state.snapshot.$v")), files)
    p.close()
  }

  test("cleanup: after 20 commits + per-batch maintenance only 3 versions remain") {
    val dir = Files.createTempDirectory("graft-gc").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    (0 until 20).foreach { v =>
      val s = p.getStore(v, None)
      put(s, s"k$v", v)
      s.commit()
      p.doMaintenance()
    }
    val versions = snapshotFiles(dir)
      .map(_.stripPrefix("state.snapshot.").toLong).sorted
    assert(versions === Seq(18L, 19L, 20L))
    // last retained version has all 20 keys
    val s = p.getStore(20, None)
    assert(contents(s).size === 20)
    s.abort()
    p.close()
  }

  test("corrupted snapshot degrades to next-older version; all-corrupt → empty") {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    (0 until 6).foreach { v =>
      val s = p.getStore(v, None)
      put(s, "batch", v)
      s.commit()
    }
    p.close() // drop local snapshot cache so recovery must go through files

    // corrupt v6's zip: getStore(6) must fall back to v5's data
    val p2 = initProvider(new RocksDbStateStoreProvider, dir)
    Files.write(new File(s"$dir/0/0/state.snapshot.6").toPath, Array[Byte](1, 2, 3))
    val s6 = p2.getStore(6, None)
    assert(get(s6, "batch").contains(4)) // v5 holds batch=4 (commit v wrote v-1)
    s6.abort()

    // corrupt everything: getStore(6) opens empty rather than failing
    (1 to 6).foreach { v =>
      Files.write(new File(s"$dir/0/0/state.snapshot.$v").toPath, Array[Byte](9))
    }
    val p3 = initProvider(new RocksDbStateStoreProvider, dir)
    val sEmpty = p3.getStore(6, None)
    assert(contents(sEmpty).isEmpty)
    sEmpty.abort()
    p2.close(); p3.close()
  }

  test("recovery from durable snapshots after provider restart (executor loss)") {
    val dir = Files.createTempDirectory("graft-restart").toString
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    val s0 = p.getStore(0, None)
    (1 to 50).foreach(i => put(s0, s"k$i", i))
    s0.commit()
    p.close() // simulates executor death: local dirs gone, zips remain

    val p2 = initProvider(new RocksDbStateStoreProvider, dir)
    val s1 = p2.getStore(1, None)
    assert(contents(s1).size === 50)
    assert(get(s1, "k37").contains(37))
    s1.abort()
    p2.close()
  }
}
