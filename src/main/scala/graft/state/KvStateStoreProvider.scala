package graft.state

import java.util.concurrent.ConcurrentHashMap

import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

/** External-KV backend seam — the role the reference's Redis and Aerospike
  * providers play (reference RedisStateStoreProvider.scala,
  * AerospikeStateStoreProvider.scala), with their client libraries behind
  * one minimal transactional interface so a real `Jedis`/`AerospikeClient`
  * adapter drops in without touching provider logic.
  *
  * Key layout matches the reference's Redis scheme: the store prefix and
  * version are baked into every key (`<prefix>:<version>:` ++ key bytes,
  * reference redis/package.scala:5-12) so one shared server hosts every
  * (operator, partition, version) keyspace and `getStore(v)` is just a
  * prefix switch.
  *
  * Reference bugs intentionally NOT reproduced (SURVEY.md §7):
  * `remove` is real (Redis's was an empty no-op), batch writes are
  * transactional per commit (Aerospike's leaked on abort), and iterator
  * keys are returned WITHOUT the version prefix (Redis returned
  * prefix-polluted key bytes).
  */
trait KvClient {
  def get(key: Array[Byte]): Array[Byte]
  /** Apply puts and deletes atomically (Redis MULTI/EXEC shape,
    * reference RedisStateStoreProvider.scala:100-133). */
  def writeBatch(puts: Seq[(Array[Byte], Array[Byte])], deletes: Seq[Array[Byte]]): Unit
  /** All (key, value) pairs whose key starts with `prefix` — the server-side
    * analog of Redis SCAN MATCH (NOT the reference's O(n·roundtrip)
    * KEYS + per-key GET). */
  def scanPrefix(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])]
  def deletePrefix(prefix: Array[Byte]): Unit
  def close(): Unit
}

/** In-JVM KvClient standing in for a Redis/Aerospike server (the real
  * client jars are not available offline — SURVEY.md §7 environment
  * facts). Keyed globally so separate provider instances see one "server".
  */
object EmbeddedKvServer {
  private val spaces = new ConcurrentHashMap[String, ConcurrentHashMap[BytesKey, Array[Byte]]]()

  def client(namespace: String): KvClient = new KvClient {
    private val data =
      spaces.computeIfAbsent(namespace, _ => new ConcurrentHashMap[BytesKey, Array[Byte]]())

    def get(key: Array[Byte]): Array[Byte] = data.get(new BytesKey(key))

    def writeBatch(puts: Seq[(Array[Byte], Array[Byte])], deletes: Seq[Array[Byte]]): Unit =
      data.synchronized {
        puts.foreach { case (k, v) => data.put(new BytesKey(k), v) }
        deletes.foreach(k => data.remove(new BytesKey(k)))
      }

    def scanPrefix(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])] =
      data.entrySet().iterator().asScala
        .filter(e => ByteOrdering.hasPrefix(e.getKey.bytes, prefix))
        .map(e => (e.getKey.bytes, e.getValue))

    def deletePrefix(prefix: Array[Byte]): Unit =
      data.keySet().asScala.filter(k => ByteOrdering.hasPrefix(k.bytes, prefix))
        .toList.foreach(data.remove)

    def close(): Unit = ()
  }

  def clear(): Unit = spaces.clear()
}

/** Versioned sessions over a [[KvClient]]: reads hit `<prefix>:<v>:`,
  * writes buffer locally and commit as one atomic batch under
  * `<prefix>:<v+1>:` (read-version / write-next-version, the Redis
  * semantics — reference RedisStateStoreProvider.scala:108,119).
  */
final class KvSessionBackend(storePrefix: String, client: KvClient)
    extends SessionBackend {

  private val Sep: Byte = ':'
  private def versionPrefix(v: Long): Array[Byte] = {
    val p = storePrefix.getBytes("UTF-8")
    val vb = java.lang.Long.toString(v).getBytes("UTF-8")
    val out = new Array[Byte](p.length + 1 + vb.length + 1)
    System.arraycopy(p, 0, out, 0, p.length)
    out(p.length) = Sep
    System.arraycopy(vb, 0, out, p.length + 1, vb.length)
    out(out.length - 1) = Sep
    out
  }
  private val versionsKey = s"$storePrefix:__versions__".getBytes("UTF-8")

  private def committed(): Set[Long] = {
    val raw = client.get(versionsKey)
    if (raw == null) Set.empty
    else new String(raw, "UTF-8").split(',').filter(_.nonEmpty).map(_.toLong).toSet
  }

  private def recordVersion(v: Long): Unit = {
    val vs = committed() + v
    client.writeBatch(
      Seq(versionsKey -> vs.toSeq.sorted.mkString(",").getBytes("UTF-8")), Seq.empty)
  }

  override def committedVersions(): Seq[Long] = committed().toSeq.sorted

  override def open(loadVersion: Long, commitVersion: Long): StoreSession = {
    // lenient ladder: newest committed version ≤ loadVersion, else empty
    val base = committed().filter(_ <= loadVersion) match {
      case s if s.isEmpty => None
      case s => Some(s.max)
    }
    val readPrefix = base.map(versionPrefix)

    new StoreSession {
      // local overlay: server state stays untouched until commit (the
      // MULTI/EXEC discipline — and abort is a real rollback)
      private var overlay = TreeMap.empty[BytesKey, Option[Array[Byte]]](ByteOrdering)

      private def strip(full: Array[Byte], prefix: Array[Byte]): Array[Byte] =
        java.util.Arrays.copyOfRange(full, prefix.length, full.length)

      def get(key: Array[Byte]): Array[Byte] =
        overlay.get(new BytesKey(key)) match {
          case Some(Some(v)) => v
          case Some(None) => null
          case None =>
            readPrefix.map(p => client.get(p ++ key)).orNull
        }

      def put(key: Array[Byte], value: Array[Byte]): Unit =
        overlay += (new BytesKey(key) -> Some(value))

      def remove(key: Array[Byte]): Unit =
        overlay += (new BytesKey(key) -> None)

      def scan(prefix: Array[Byte]): Iterator[(Array[Byte], Array[Byte])] = {
        val fromServer: Map[BytesKey, Array[Byte]] = readPrefix match {
          case None => Map.empty
          case Some(p) =>
            client.scanPrefix(p ++ prefix)
              .map { case (k, v) => new BytesKey(strip(k, p)) -> v }.toMap
        }
        val merged = fromServer ++ overlay.iterator.collect {
          case (k, Some(v)) if ByteOrdering.hasPrefix(k.bytes, prefix) => k -> v
        }.toMap
        val removed = overlay.collect { case (k, None) => k }.toSet
        merged.view.filterKeys(k => !removed.contains(k))
          .toSeq.sortBy(_._1)(ByteOrdering)
          .iterator.map { case (k, v) => (k.bytes, v) }
      }

      def commit(): Unit = {
        val writePrefix = versionPrefix(commitVersion)
        // seed the new version with the base version's surviving entries,
        // then apply the overlay — one atomic batch
        val seed: Seq[(Array[Byte], Array[Byte])] = readPrefix match {
          case None => Seq.empty
          case Some(p) =>
            client.scanPrefix(p).map { case (k, v) =>
              (writePrefix ++ strip(k, p), v)
            }.toSeq
        }
        val puts = seed ++ overlay.iterator.collect {
          case (k, Some(v)) => (writePrefix ++ k.bytes, v)
        }.toSeq
        val deletes = overlay.iterator.collect {
          case (k, None) => writePrefix ++ k.bytes
        }.toSeq
        client.writeBatch(puts, deletes)
        recordVersion(commitVersion)
      }

      def abort(): Unit = overlay = TreeMap.empty(ByteOrdering)

      def numKeys: Long = scan(Array.emptyByteArray).size.toLong
      def sizeBytes: Long =
        scan(Array.emptyByteArray).map { case (k, v) => k.length + v.length }.sum.toLong
    }
  }

  override def doMaintenance(minVersionsToRetain: Int): Unit = {
    val vs = committedVersions()
    if (vs.nonEmpty) {
      val earliest = vs.max - minVersionsToRetain + 1
      val keep = vs.filter(_ >= earliest)
      vs.filter(_ < earliest).foreach(v => client.deletePrefix(versionPrefix(v)))
      client.writeBatch(
        Seq(versionsKey -> keep.mkString(",").getBytes("UTF-8")), Seq.empty)
    }
  }

  override def close(): Unit = client.close()
}

/** Provider wiring the KV seam to the embedded server. A production
  * deployment swaps `EmbeddedKvServer.client(...)` for a Jedis/Aerospike
  * adapter implementing [[KvClient]] — nothing else changes.
  */
class KvStateStoreProvider extends GraftStateStoreProviderBase {
  override protected def createBackend(): SessionBackend = {
    val prefix = s"${storeId.checkpointRootLocation}/${storeId.operatorId}/" +
      s"${storeId.partitionId}/${storeId.storeName}"
    new KvSessionBackend(prefix, EmbeddedKvServer.client("default"))
  }
}
