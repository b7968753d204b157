package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.streaming.state._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RangeKeyScanStateEncoderSpec support: column families whose physical
  * keys carry an order-preserving big-endian section for the ordering
  * columns, so backend iteration returns entries in VALUE order (Spark's
  * TTL/timer cleanup iterates these CFs and stops at the first live
  * timestamp — raw-row-byte order would silently break that early-exit).
  */
class RangeKeyScanSuite extends AnyFunSuite {
  import StateTestHelper._

  private val rangeKeySchema = StructType(Seq(
    StructField("expiresAt", LongType, nullable = true),
    StructField("elem", StringType, nullable = true)))

  private val keyProj = UnsafeProjection.create(
    Array[DataType](LongType, StringType))

  private def rangeKey(ts: java.lang.Long, elem: String) =
    keyProj.apply(InternalRow(
      if (ts == null) null else ts.longValue(),
      UTF8String.fromString(elem))).copy()

  private def backends: Seq[(String, () => GraftStateStoreProviderBase)] = Seq(
    "rocksdb" -> (() => new RocksDbStateStoreProvider),
    "inmemory" -> (() => new InMemoryStateStoreProvider))

  test("range-scan CF iterates in ordering-column order (nulls first)") {
    backends.foreach { case (name, mk) =>
      val dir = Files.createTempDirectory(s"graft-range-$name").toString + "/q/state"
      val p = initProvider(mk(), dir)
      val s0 = p.getStore(0, None)
      s0.createColFamilyIfAbsent("ttlIdx", rangeKeySchema, valueSchema,
        RangeKeyScanStateEncoderSpec(rangeKeySchema, Seq(0)),
        useMultipleValuesPerKey = false, isInternal = true)
      // scrambled inserts, negatives included — insertion order must not matter
      val entries = Seq(
        (java.lang.Long.valueOf(50L), "c"), (java.lang.Long.valueOf(-10L), "b"),
        (java.lang.Long.valueOf(1000L), "a"), (java.lang.Long.valueOf(0L), "z"),
        (null.asInstanceOf[java.lang.Long], "n"), (java.lang.Long.valueOf(-10L), "a"))
      entries.foreach { case (ts, e) =>
        s0.put(rangeKey(ts, e), valueRow(1), "ttlIdx")
      }
      val got = s0.iterator("ttlIdx").toSeq.map { pair =>
        (if (pair.key.isNullAt(0)) null else java.lang.Long.valueOf(pair.key.getLong(0)),
          pair.key.getUTF8String(1).toString)
      }
      assert(got.map(_._1) ===
        Seq(null, java.lang.Long.valueOf(-10L), java.lang.Long.valueOf(-10L),
          java.lang.Long.valueOf(0L), java.lang.Long.valueOf(50L),
          java.lang.Long.valueOf(1000L)),
        s"backend $name iterated out of order: $got")
      // point lookups still resolve through the range encoding
      assert(Option(s0.get(rangeKey(50L, "c"), "ttlIdx")).map(valueOf).contains(1))
      s0.remove(rangeKey(-10L, "b"), "ttlIdx")
      assert(s0.get(rangeKey(-10L, "b"), "ttlIdx") === null)
      assert(s0.iterator("ttlIdx").size === 5)
      s0.commit()
      p.close()
    }
  }

  test("range section round-trips the full key row intact") {
    val dir = Files.createTempDirectory("graft-range-rt").toString + "/q/state"
    val p = initProvider(new RocksDbStateStoreProvider, dir)
    val s0 = p.getStore(0, None)
    s0.createColFamilyIfAbsent("idx", rangeKeySchema, valueSchema,
      RangeKeyScanStateEncoderSpec(rangeKeySchema, Seq(0)),
      useMultipleValuesPerKey = false, isInternal = true)
    s0.put(rangeKey(Long.MaxValue, "edge"), valueRow(7), "idx")
    s0.put(rangeKey(Long.MinValue, "edge2"), valueRow(8), "idx")
    val decoded = s0.iterator("idx").toSeq
      .map(pr => (pr.key.getLong(0), pr.key.getUTF8String(1).toString, valueOf(pr.value)))
    assert(decoded === Seq(
      (Long.MinValue, "edge2", 8), (Long.MaxValue, "edge", 7)))
    s0.commit()
    p.close()
  }
}
