package graft.state

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.state.StateStore

/** StateRescale at the SPI level: every key lands in the partition
  * Spark's exchange would route it to, nothing is lost or duplicated,
  * versions align, and torn checkpoints are refused.
  */
abstract class StateRescaleSuiteBase extends AnyFunSuite {
  import StateTestHelper._

  def makeProvider(): GraftStateStoreProviderBase
  def backendName: String

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-rescale-$tag").toString

  /** Build oldN partitions of keyed state routed the way Spark would,
    * committed through `versions` batches (key set shifts per batch so
    * the final version is what must survive). Returns the final data.
    */
  private def seed(root: String, oldN: Int, versions: Int,
                   keys: Seq[String]): Map[String, Int] = {
    val partId = StateRescale.partitionIdExpressionFor(keySchema, oldN)
    val byPart = keys.groupBy(k => partId.eval(keyRow(k)).asInstanceOf[Int])
    var finalData = Map.empty[String, Int]
    (0 until oldN).foreach { p =>
      val prov = initProvider(makeProvider(), root, partition = p)
      (1 to versions).foreach { v =>
        val s = prov.getStore(v - 1, None)
        byPart.getOrElse(p, Nil).foreach { k =>
          val value = k.hashCode.abs % 1000 + v
          put(s, k, value)
          if (v == versions) finalData += (k -> value)
        }
        assert(s.commit() == v)
      }
      prov.close()
    }
    finalData
  }

  test(s"$backendName: 2 -> 4 preserves every pair in the Spark-routed partition") {
    val oldRoot = tmp("old"); val newRoot = tmp("new")
    val keys = (0 until 97).map(i => s"user-$i")
    val expected = seed(oldRoot, oldN = 2, versions = 3, keys)

    val report = StateRescale.rescale(() => makeProvider(), oldRoot, newRoot,
      operatorId = 0, oldN = 2, newN = 4, keySchema, valueSchema, storeConf())
    assert(report.version == 3 && report.keysMoved == 97)
    assert(report.perNewPartition.values.sum == 97)
    assert(report.perNewPartition.values.count(_ > 0) == 4, // 97 keys spread over 4
      s"suspicious skew: ${report.perNewPartition}")

    val partId4 = StateRescale.partitionIdExpressionFor(keySchema, 4)
    var seen = Map.empty[String, Int]
    (0 until 4).foreach { p =>
      val prov = initProvider(makeProvider(), newRoot, partition = p)
      val s = prov.getStore(3, None)
      val it = s.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
      it.foreach { pair =>
        val k = keyOf(pair.key)
        assert(partId4.eval(pair.key).asInstanceOf[Int] == p,
          s"key $k landed in partition $p but Spark routes it elsewhere")
        seen += (k -> valueOf(pair.value))
      }
      it.close(); s.abort(); prov.close()
    }
    assert(seen == expected, "rescaled state differs from the source")
  }

  test(s"$backendName: scale DOWN 4 -> 2 also conserves") {
    val oldRoot = tmp("old2"); val newRoot = tmp("new2")
    val keys = (0 until 41).map(i => s"k$i")
    val expected = seed(oldRoot, oldN = 4, versions = 2, keys)
    val report = StateRescale.rescale(() => makeProvider(), oldRoot, newRoot,
      operatorId = 0, oldN = 4, newN = 2, keySchema, valueSchema, storeConf())
    assert(report.keysMoved == 41 && report.version == 2)
    var n = 0L
    (0 until 2).foreach { p =>
      val prov = initProvider(makeProvider(), newRoot, partition = p)
      val s = prov.getStore(2, None)
      val it = s.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
      it.foreach { pair =>
        val k = keyOf(pair.key)
        assert(expected.contains(k)); n += 1
      }
      it.close(); s.abort(); prov.close()
    }
    assert(n == 41)
  }

  test(s"$backendName: prune drops exactly the rejected keys, same partitions/version") {
    val oldRoot = tmp("pruneOld"); val newRoot = tmp("pruneNew")
    val keys = (0 until 30).map(i => s"user-$i")
    val expected = seed(oldRoot, oldN = 3, versions = 2, keys)
    val forget = Set("user-3", "user-17", "user-29")
    val report = StateRescale.prune(() => makeProvider(), oldRoot, newRoot,
      operatorId = 0, numPartitions = 3, keySchema, valueSchema, storeConf(),
      keep = row => !forget(row.getUTF8String(0).toString))
    assert(report.version == 2 && report.keysMoved == 27, s"$report")
    var seen = Map.empty[String, Int]
    (0 until 3).foreach { p =>
      val prov = initProvider(makeProvider(), newRoot, partition = p)
      val s = prov.getStore(2, None)
      val it = s.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
      it.foreach(pair => seen += (keyOf(pair.key) -> valueOf(pair.value)))
      it.close(); s.abort(); prov.close()
    }
    assert(seen == expected -- forget, "pruned state must be source minus forgotten keys")
  }

  test(s"$backendName: multi-operator checkpoint — per-op rescaleCheckpoint calls compose") {
    val oldCkpt = tmp("multiOld"); val newCkpt = tmp("multiNew")
    // two stateful operators in one checkpoint, both at 2 partitions
    // and version 1 (a chained-stateful-ops plan)
    val keysByOp = Map(0L -> Seq("a", "b", "c", "d"), 1L -> Seq("x", "y", "z"))
    keysByOp.foreach { case (op, keys) =>
      val partId = StateRescale.partitionIdExpressionFor(keySchema, 2)
      val byPart = keys.groupBy(k => partId.eval(keyRow(k)).asInstanceOf[Int])
      (0 until 2).foreach { p =>
        val prov = makeProvider()
        prov.init(org.apache.spark.sql.execution.streaming.state.StateStoreId(
            s"$oldCkpt/state", op, p),
          keySchema, valueSchema,
          org.apache.spark.sql.execution.streaming.state.NoPrefixKeyStateEncoderSpec(keySchema),
          useColumnFamilies = false, storeConf(), new org.apache.hadoop.conf.Configuration(),
          useMultipleValuesPerKey = false, stateSchemaProvider = None)
        val s = prov.getStore(0, None)
        byPart.getOrElse(p, Nil).foreach(k => put(s, k, k.length))
        assert(s.commit() == 1)
        prov.close()
      }
    }
    // a minimal offsets file carrying the pinned partition count
    val off = Paths.get(oldCkpt, "offsets")
    Files.createDirectories(off)
    Files.write(off.resolve("0"),
      """v1
        |{"conf":{"spark.sql.shuffle.partitions":"2"}}
        |0""".stripMargin.getBytes("UTF-8"))

    // rescale each operator in turn into the SAME destination
    keysByOp.keys.toSeq.sorted.foreach { op =>
      val r = StateRescale.rescaleCheckpoint(() => makeProvider(), oldCkpt, newCkpt,
        operatorId = op, oldN = 2, newN = 3, keySchema, valueSchema, storeConf())
      assert(r.keysMoved == keysByOp(op).size, s"op $op: $r")
    }
    // both operators' full key sets present in the new layout
    keysByOp.foreach { case (op, keys) =>
      var seen = Set.empty[String]
      (0 until 3).foreach { p =>
        val prov = makeProvider()
        prov.init(org.apache.spark.sql.execution.streaming.state.StateStoreId(
            s"$newCkpt/state", op, p),
          keySchema, valueSchema,
          org.apache.spark.sql.execution.streaming.state.NoPrefixKeyStateEncoderSpec(keySchema),
          useColumnFamilies = false, storeConf(), new org.apache.hadoop.conf.Configuration(),
          useMultipleValuesPerKey = false, stateSchemaProvider = None)
        val s = prov.getStore(1, None)
        val it = s.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
        it.foreach(pair => seen += keyOf(pair.key))
        it.close(); s.abort(); prov.close()
      }
      assert(seen == keys.toSet, s"op $op keys after compose: $seen")
    }
    // and the offsets conf flipped exactly once
    val conf = new String(Files.readAllBytes(
      Paths.get(newCkpt, "offsets", "0")), "UTF-8")
    assert(conf.contains("\"spark.sql.shuffle.partitions\":\"3\""), conf)
  }

  test(s"$backendName: countKeys refuses a root with no committed version") {
    // a compliance re-proof over a typo'd / nonexistent path must not
    // read as "zero residuals" — silent absence is not proof
    val e = intercept[IllegalArgumentException] {
      StateRescale.countKeys(() => makeProvider(), tmp("ghost"),
        operatorId = 0, numPartitions = 2, keySchema, valueSchema, storeConf())
    }
    assert(e.getMessage.contains("proves nothing"), e.getMessage)
    // and a real, committed-but-then-emptied store still counts (0 is a
    // legitimate answer when the versions are there)
    val root = tmp("emptyok")
    val prov = initProvider(makeProvider(), root, partition = 0)
    val s = prov.getStore(0, None); put(s, "a", 1); s.commit()
    val s2 = prov.getStore(1, None)
    s2.remove(keyRow("a").copy()); s2.commit()
    prov.close()
    val prov1 = initProvider(makeProvider(), root, partition = 1)
    val s3 = prov1.getStore(0, None); s3.commit()
    prov1.close()
    assert(StateRescale.countKeys(() => makeProvider(), root,
      operatorId = 0, numPartitions = 2, keySchema, valueSchema,
      storeConf()) === 0L)
  }

  test(s"$backendName: torn checkpoint (version skew across partitions) is refused") {
    val oldRoot = tmp("torn"); val newRoot = tmp("tornNew")
    // partition 0 at version 2, partition 1 at version 1
    val p0 = initProvider(makeProvider(), oldRoot, partition = 0)
    val s0 = p0.getStore(0, None); put(s0, "a", 1); s0.commit()
    val s0b = p0.getStore(1, None); put(s0b, "b", 2); s0b.commit()
    p0.close()
    val p1 = initProvider(makeProvider(), oldRoot, partition = 1)
    val s1 = p1.getStore(0, None); put(s1, "c", 3); s1.commit()
    p1.close()
    intercept[IllegalArgumentException] {
      StateRescale.rescale(() => makeProvider(), oldRoot, newRoot,
        operatorId = 0, oldN = 2, newN = 3, keySchema, valueSchema, storeConf())
    }
  }
}

class StateRescaleRocksDbSuite extends StateRescaleSuiteBase {
  def makeProvider(): GraftStateStoreProviderBase = new RocksDbStateStoreProvider
  def backendName: String = "rocksdb"
}

class StateRescaleInMemorySuite extends StateRescaleSuiteBase {
  def makeProvider(): GraftStateStoreProviderBase = new InMemoryStateStoreProvider
  def backendName: String = "inmemory"
}

class StateRescaleKvSuite extends StateRescaleSuiteBase {
  def makeProvider(): GraftStateStoreProviderBase = new KvStateStoreProvider
  def backendName: String = "kv"
}
