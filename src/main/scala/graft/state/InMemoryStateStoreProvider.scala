package graft.state

import java.util.concurrent.ConcurrentHashMap

import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

/** Unsigned-lexicographic byte ordering — matches RocksDB's default
  * comparator so both backends iterate identically.
  */
object ByteOrdering extends Ordering[BytesKey] {
  def compare(a: BytesKey, b: BytesKey): Int =
    java.util.Arrays.compareUnsigned(a.bytes, b.bytes)

  def hasPrefix(key: Array[Byte], prefix: Array[Byte]): Boolean = {
    if (prefix.length > key.length) return false
    var i = 0
    while (i < prefix.length) {
      if (key(i) != prefix(i)) return false
      i += 1
    }
    true
  }
}

/** In-memory versioned KV backend: each committed version is an immutable
  * sorted map in a JVM-global registry keyed by
  * (checkpointLocation, operatorId, partitionId, storeName) — the same
  * role the reference's Redis backend plays (version-prefixed keyspace in
  * an external KV, reference redis/package.scala:5-12) with the JVM heap
  * standing in for the server, so the engine's pluggable-backend seam is
  * exercised without an offline-unavailable client jar.
  *
  * Working sets copy-on-open (persistent TreeMap structural sharing keeps
  * that cheap); commit publishes an immutable snapshot; maintenance drops
  * versions below `max - minVersionsToRetain + 1` exactly like the
  * reference's GC (reference RocksDbStateStoreProvider.scala:560-579).
  */
object InMemoryStateRegistry {
  type Snapshot = TreeMap[BytesKey, Array[Byte]]
  private val stores = new ConcurrentHashMap[String, ConcurrentHashMap[Long, Snapshot]]()

  def forStore(storeKey: String): ConcurrentHashMap[Long, Snapshot] =
    stores.computeIfAbsent(storeKey, _ => new ConcurrentHashMap[Long, Snapshot]())

  def clear(): Unit = stores.clear()

  def clear(storeKeyPrefix: String): Unit =
    stores.keySet().asScala.filter(_.startsWith(storeKeyPrefix))
      .foreach(stores.remove)
}

final class InMemorySessionBackend(storeKey: String) extends SessionBackend {
  import InMemoryStateRegistry.Snapshot

  private val versions = InMemoryStateRegistry.forStore(storeKey)

  /** Lenient recovery ladder: newest committed version ≤ loadVersion, else
    * empty (mirrors reference RocksDbStateStoreProvider.scala:371-388).
    * Background maintenance can remove a candidate between the keyset
    * filter and the get — a null there must fall through to the next
    * older version (the ladder's whole point), not NPE the session.
    */
  private def snapshotAsOf(loadVersion: Long): Snapshot = {
    val candidates = versions.keySet().asScala.filter(_ <= loadVersion)
      .toSeq.sorted.reverse
    candidates.iterator
      .map(versions.get)          // null when GC'd after the listing
      .collectFirst { case s if s != null => s }
      .getOrElse(TreeMap.empty(ByteOrdering))
  }

  override def open(loadVersion: Long, commitVersion: Long): StoreSession =
    new StoreSession {
      private var data: Snapshot = snapshotAsOf(loadVersion)

      def get(key: Array[Byte]): Array[Byte] =
        data.getOrElse(new BytesKey(key), null)

      def put(key: Array[Byte], value: Array[Byte]): Unit =
        data += (new BytesKey(key) -> value)

      def remove(key: Array[Byte]): Unit =
        data -= new BytesKey(key)

      def scan(prefix: Array[Byte]): KvScanIterator = {
        val it =
          if (prefix.isEmpty) data.iterator
          else data.iteratorFrom(new BytesKey(prefix))
            .takeWhile { case (k, _) => ByteOrdering.hasPrefix(k.bytes, prefix) }
        // heap-backed persistent map: nothing native to release
        KvScanIterator.wrap(it.map { case (k, v) => (k.bytes, v) })
      }

      def commit(): Unit = versions.put(commitVersion, data)
      def abort(): Unit = data = TreeMap.empty(ByteOrdering)
      def numKeys: Long = data.size.toLong
      def sizeBytes: Long =
        data.iterator.map { case (k, v) => k.bytes.length + v.length }.sum.toLong
    }

  override def committedVersions(): Seq[Long] =
    versions.keySet().asScala.toSeq.sorted

  override def doMaintenance(minVersionsToRetain: Int): Unit = {
    val vs = committedVersions()
    if (vs.nonEmpty) {
      val earliest = vs.max - minVersionsToRetain + 1
      vs.filter(_ < earliest).foreach(versions.remove)
    }
  }

  override def close(): Unit = ()
}

/** The pluggable in-memory provider: register with
  * `spark.sql.streaming.stateStore.providerClass =
  * graft.state.InMemoryStateStoreProvider` (or
  * `GraftSession.useInMemoryStateStore()`).
  */
class InMemoryStateStoreProvider extends GraftStateStoreProviderBase {
  override protected def createBackend(): SessionBackend =
    new InMemorySessionBackend(
      s"${storeId.checkpointRootLocation}/${storeId.operatorId}/" +
        s"${storeId.partitionId}/${storeId.storeName}")
}
