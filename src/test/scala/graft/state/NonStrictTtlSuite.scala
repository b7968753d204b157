package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Non-strict TTL (storage-level lazy expiry via RocksDB TtlDB — the
  * reference's `strictExpire=false` mode, "≥ ttl, best effort",
  * reference RocksDbStateStoreProvider.scala:62-71) and the stateTimeout
  * writer helper's conf wiring.
  */
class NonStrictTtlSuite extends AnyFunSuite {
  import StateTestHelper._

  test("non-strict mode opens a TtlDB and data within TTL stays readable") {
    val dir = Files.createTempDirectory("graft-nonstrict").toString + "/q/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.q" -> "3600", // long TTL: nothing expires in-test
      TtlConf.StrictKey -> "false"))
    val p = initProvider(new RocksDbStateStoreProvider, dir, conf)
    val s0 = p.getStore(0, None)
    put(s0, "k", 7)
    assert(get(s0, "k").contains(7))
    assert(s0.commit() === 1)
    val s1 = p.getStore(1, None)
    assert(get(s1, "k").contains(7)) // well within TTL → visible
    assert(contents(s1) === Map("k" -> 7))
    s1.abort()
    p.close()
  }

  test("non-strict recovery replays changelogs through the TtlDB value framing") {
    // regression: loadInto used to replay changelogs via plain RocksDB.open
    // while the live store opens via TtlDB — TtlDB values carry a 4-byte
    // timestamp suffix, so replayed values came back truncated/corrupt
    // after any fresh-provider recovery
    val dir = Files.createTempDirectory("graft-nonstrict-rec").toString + "/q/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.q" -> "3600",
      TtlConf.StrictKey -> "false"))
    val p1 = initProvider(new RocksDbStateStoreProvider, dir, conf)
    val s0 = p1.getStore(0, None)
    put(s0, "k", 7)
    put(s0, "j", 11)
    assert(s0.commit() === 1)
    p1.close() // drops local snapshots; only the remote changelog survives

    val p2 = initProvider(new RocksDbStateStoreProvider, dir, conf)
    val s1 = p2.getStore(1, None)
    assert(get(s1, "k").contains(7))
    assert(contents(s1) === Map("k" -> 7, "j" -> 11))
    s1.abort()
    p2.close()
  }

  test("non-strict ttl=0 is still stateless (storage TTL can't express it)") {
    val dir = Files.createTempDirectory("graft-nonstrict0").toString + "/q/state"
    val conf = storeConf(extra = Map(
      s"${TtlConf.ExpiryKey}.q" -> "0",
      TtlConf.StrictKey -> "false"))
    val p = initProvider(new RocksDbStateStoreProvider, dir, conf)
    val s0 = p.getStore(0, None)
    put(s0, "k", 7)
    assert(get(s0, "k").isEmpty)
    assert(contents(s0).isEmpty)
    s0.commit()
    p.close()
  }

  test("stateTimeout writer helper sets the per-query conf and checkpoint") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-statetimeout")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import graft.state.implicits._
      val ds = spark.readStream.format("rate").load()
      val ckpt = Files.createTempDirectory("graft-st").toString
      ds.writeStream.stateTimeout(spark, "myq", 42, ckpt)
      assert(spark.conf.get(s"${TtlConf.ExpiryKey}.myq") === "42")
      // negative values clamp to -1 (infinite), reference semantics
      ds.writeStream.stateTimeout(spark, "myq2", -999, ckpt)
      assert(spark.conf.get(s"${TtlConf.ExpiryKey}.myq2") === "-1")
      // the provider-side parser resolves the same key from the path the
      // helper produced
      val resolved = TtlConf.queryNameFromCheckpoint(s"$ckpt/myq/state")
      assert(resolved === "myq")
    } finally spark.stop()
  }
}
