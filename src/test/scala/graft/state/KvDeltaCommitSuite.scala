package graft.state

import org.scalatest.funsuite.AnyFunSuite

/** The external-KV backend must write O(batch delta) per commit, not
  * O(total state): the old design copied the whole base keyspace forward
  * every batch, which defeats an external KV at any real state size.
  */
class KvDeltaCommitSuite extends AnyFunSuite {

  /** Counts data puts per writeBatch (registry keys excluded). */
  private class CountingClient(inner: KvClient) extends KvClient {
    var lastBatchDataPuts: Int = 0
    val batchDataPuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    def get(key: Array[Byte]): Array[Byte] = inner.get(key)
    def writeBatch(puts: Seq[(Array[Byte], Array[Byte])], deletes: Seq[Array[Byte]]): Unit = {
      val dataPuts = puts.count { case (k, _) =>
        !new String(k, "UTF-8").contains("__")
      }
      lastBatchDataPuts = dataPuts
      batchDataPuts += dataPuts
      inner.writeBatch(puts, deletes)
    }
    def scanPrefix(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])] =
      inner.scanPrefix(prefix)
    def deletePrefix(prefix: Array[Byte]): Unit = inner.deletePrefix(prefix)
    def close(): Unit = inner.close()
  }

  private def k(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("commit writes are proportional to the batch delta; bases amortize") {
    EmbeddedKvServer.clear()
    val client = new CountingClient(EmbeddedKvServer.client("delta-test"))
    val backend = new KvSessionBackend("store", client, baseInterval = 10)

    // v1: 100-key base state
    val s1 = backend.open(0, 1)
    (1 to 100).foreach(i => s1.put(k(f"key$i%03d"), k(s"v$i")))
    s1.commit()
    assert(client.lastBatchDataPuts === 100)

    // v2..v5: single-key updates — each commit must write ~1 data key
    (2 to 5).foreach { v =>
      val s = backend.open(v - 1, v)
      s.put(k("key001"), k(s"updated$v"))
      s.commit()
      assert(client.lastBatchDataPuts === 1,
        s"delta commit v$v wrote ${client.lastBatchDataPuts} data keys")
    }

    // deletes travel as tombstones, still O(delta)
    val s6 = backend.open(5, 6)
    s6.remove(k("key002"))
    s6.commit()
    assert(client.lastBatchDataPuts === 1)

    // resolution through the chain: latest update wins, tombstone hides
    val s7 = backend.open(6, 7)
    assert(new String(s7.get(k("key001")), "UTF-8") === "updated5")
    assert(s7.get(k("key002")) === null)
    assert(s7.scan(Array.emptyByteArray).size === 99)

    // v10 is on the base cadence → full materialization (99 keys + delta)
    (7 to 9).foreach { v => s7.asInstanceOf[AnyRef]; val s = backend.open(v - 1, v); s.commit() }
    val s10 = backend.open(9, 10)
    s10.put(k("key101"), k("new"))
    s10.commit()
    assert(client.lastBatchDataPuts === 100) // 99 surviving + 1 new

    // post-base delta commits are small again
    val s11 = backend.open(10, 11)
    s11.put(k("key003"), k("x"))
    s11.commit()
    assert(client.lastBatchDataPuts === 1)
  }

  test("maintenance compacts to a base at the horizon and GCs older versions") {
    EmbeddedKvServer.clear()
    val client = new CountingClient(EmbeddedKvServer.client("compact-test"))
    val backend = new KvSessionBackend("store", client, baseInterval = 1000) // cadence off
    val s1 = backend.open(0, 1)
    (1 to 20).foreach(i => s1.put(k(s"k$i"), k(s"v$i")))
    s1.commit()
    (2 to 6).foreach { v =>
      val s = backend.open(v - 1, v)
      s.put(k(s"k$v"), k(s"updated$v"))
      if (v == 4) s.remove(k("k1"))
      s.commit()
    }
    backend.doMaintenance(minVersionsToRetain = 2)
    // horizon = 6 - 2 + 1 = 5: versions < 5 gone, state resolved at 5 intact
    assert(backend.committedVersions() === Seq(5, 6))
    val s = backend.open(6, 7)
    assert(s.get(k("k1")) === null) // tombstoned at v4, preserved by compaction
    assert(new String(s.get(k("k6")), "UTF-8") === "updated6")
    assert(new String(s.get(k("k3")), "UTF-8") === "updated3")
    assert(s.scan(Array.emptyByteArray).size === 19)
  }
}
