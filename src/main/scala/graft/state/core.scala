package graft.state

import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

import org.apache.spark.sql.execution.streaming.state.StateStoreConf

/** Immutable byte-array key with value equality, usable as a hash-map key. */
final class BytesKey(val bytes: Array[Byte]) extends Serializable {
  override val hashCode: Int = java.util.Arrays.hashCode(bytes)
  override def equals(o: Any): Boolean = o match {
    case other: BytesKey => java.util.Arrays.equals(bytes, other.bytes)
    case _ => false
  }
}

/** Injectable clock so TTL semantics are testable with a fake ticker
  * (mirrors the reference's Guava FakeTicker pattern,
  * reference RocksDbStateTimeoutSuite.scala:223-251).
  */
trait TtlClock extends Serializable { def nanos(): Long }
object SystemTtlClock extends TtlClock { def nanos(): Long = System.nanoTime() }

/** A manually advanced clock for tests. */
final class FakeTtlClock extends TtlClock {
  private var now = 0L
  def nanos(): Long = synchronized(now)
  def advanceSecs(s: Long): Unit = synchronized { now += s * 1000000000L }
}

/** State-TTL configuration (the reference's one novel feature — semantics
  * from reference README.md:38-108 and RocksDbStateTimeoutSuite):
  *
  *  - `expirySecs == -1` → infinite state (default)
  *  - `expirySecs == 0`  → stateless: every put is immediately invisible
  *  - `expirySecs == n`  → entries expire after n seconds of INACTIVITY;
  *    the deadline resets on create, update and read (expire-after-access)
  *
  * Per-query override `...stateExpirySecs.<queryName>` with the query name
  * recovered from the checkpoint path (reference
  * RocksDbStateStoreProvider.scala:346-362). `strictExpire` selects exact
  * expiry (access-ordered key index consulted on every read) vs best-effort
  * storage-level expiry.
  *
  * Documented deviation from the reference: expiry deadlines do NOT survive
  * recovery — keys loaded from a snapshot start a fresh TTL window on first
  * access (the reference has the same observable behavior because it
  * rebuilds its Guava cache empty on `getStore`, SURVEY.md §7 "What's
  * hard").
  */
final case class TtlConf(expirySecs: Long, strict: Boolean) {
  def enabled: Boolean = expirySecs >= 0
}

object TtlConf {
  val ExpiryKey = "spark.sql.streaming.stateStore.stateExpirySecs"
  val StrictKey = "spark.sql.streaming.stateStore.strictExpire"
  val UnnamedQuery = "UNNAMED_QUERY"
  val Infinite = -1L

  /** `<dir>/<queryName>/state` → `<queryName>` (reference recovers the query
    * name by splitting the checkpoint path the same way).
    */
  def queryNameFromCheckpoint(checkpointRootLocation: String): String = {
    val segs = checkpointRootLocation.split('/').filter(_.nonEmpty)
    val trimmed = if (segs.nonEmpty && segs.last == "state") segs.dropRight(1) else segs
    if (trimmed.nonEmpty) trimmed.last else UnnamedQuery
  }

  def fromStoreConf(conf: StateStoreConf, checkpointRootLocation: String): TtlConf = {
    val confs = conf.sqlConfs ++ conf.extraOptions
    val queryName = queryNameFromCheckpoint(checkpointRootLocation)
    val expiry = confs.get(s"$ExpiryKey.$queryName")
      .orElse(confs.get(ExpiryKey))
      .map(_.toLong).getOrElse(Infinite)
    val strict = confs.get(StrictKey).forall(_.toBoolean) // default true
    TtlConf(math.max(expiry, Infinite), strict)
  }
}

/** Exact (strict-mode) expiry index: last-touch tracking over opaque key
  * bytes, kept in TOUCH order. O(1) touch/check; `expiredKeys` walks
  * oldest-touch-first and stops at the first live key.
  *
  * The map is insertion-ordered and `touch` re-inserts (remove + put) to
  * move a key to the tail — deliberately NOT an access-ordered
  * LinkedHashMap, whose `get`/`getOrDefault` also count as "access": a
  * read-only `isExpired` probe (every iterator row goes through one)
  * would silently move an entry to the tail while keeping its OLD
  * timestamp, breaking the oldest-first invariant `expiredKeys` relies
  * on — an expired key reordered behind a hot live key would never be
  * swept and its storage would be retained indefinitely.
  */
final class ExpiryTracker(ttl: TtlConf, clock: TtlClock) {
  private val ttlNanos: Long =
    if (ttl.expirySecs > 0) ttl.expirySecs * 1000000000L else 0L

  private val lastAccess: JLinkedHashMap[BytesKey, java.lang.Long] =
    new JLinkedHashMap[BytesKey, java.lang.Long](128, 0.75f)

  def touch(key: BytesKey): Unit =
    if (ttl.enabled) {
      // re-insert so insertion order == touch order (tail = freshest)
      lastAccess.remove(key)
      lastAccess.put(key, clock.nanos())
    }

  /** True when the key must be treated as gone. Unknown keys are fresh
    * (snapshot-loaded state becomes visible and starts a new window).
    * Read-only: never perturbs the touch order.
    */
  def isExpired(key: BytesKey): Boolean = {
    if (!ttl.enabled) return false
    if (ttl.expirySecs == 0) return true // stateless mode
    val t = lastAccess.get(key)
    t != null && (clock.nanos() - t) > ttlNanos
  }

  def remove(key: BytesKey): Unit = if (ttl.enabled) lastAccess.remove(key)

  /** Expired keys in oldest-touch-first order (for commit-time cleanup).
    * In stateless mode (ttl 0) every tracked key is expired — the
    * commit sweep physically drops this batch's writes so "stateless"
    * does not quietly grow snapshots/changelogs forever.
    */
  def expiredKeys(): Seq[BytesKey] = {
    if (!ttl.enabled) return Seq.empty
    val out = Seq.newBuilder[BytesKey]
    val it = lastAccess.entrySet().iterator()
    if (ttl.expirySecs == 0) {
      while (it.hasNext) out += it.next().getKey
      return out.result()
    }
    val now = clock.nanos()
    var done = false
    while (it.hasNext && !done) {
      val e = it.next()
      if (now - e.getValue > ttlNanos) out += e.getKey else done = true
    }
    out.result()
  }
}

/** Order-preserving byte encoding for range-scan ordering columns
  * (RangeKeyScanStateEncoderSpec): unsigned-lex comparison of the encoded
  * bytes equals value comparison, so a byte-ordered backend (RocksDB, the
  * in-memory TreeMap) iterates range-scan column families in value order.
  * Layout per column: `[1B null marker: 0=null, 1=present][fixed-width
  * big-endian payload]` — nulls sort first, matching Spark's encoder.
  */
object RangeKeyCodec {
  import org.apache.spark.sql.types._

  /** Payload width in bytes; ordering columns must be fixed-width. */
  def width(dt: DataType): Int = dt match {
    case LongType | TimestampType | TimestampNTZType | DoubleType => 8
    case IntegerType | FloatType | DateType => 4
    case ShortType => 2
    case ByteType => 1
    case other =>
      throw new IllegalArgumentException(
        s"range-scan ordering column type $other is not fixed-width")
  }

  private def putBE(out: Array[Byte], off: Int, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) {
      out(off + i) = ((v >>> ((n - 1 - i) * 8)) & 0xFF).toByte
      i += 1
    }
  }

  /** Sign-flip for integers; IEEE754 total-order trick for floats. */
  private def orderBits(v: Long, n: Int): Long = v ^ (1L << (n * 8 - 1))
  private def orderDouble(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits ^ java.lang.Long.MIN_VALUE
  }
  private def orderFloat(f: Float): Long = {
    val bits = java.lang.Float.floatToIntBits(f)
    (if (bits < 0) ~bits else bits ^ Integer.MIN_VALUE).toLong & 0xFFFFFFFFL
  }

  /** Encode `row`'s column `ordinal` into `out` at `off`; returns bytes
    * written (1 + width). */
  def encode(row: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
             ordinal: Int, dt: DataType, out: Array[Byte], off: Int): Int = {
    val n = width(dt)
    if (row.isNullAt(ordinal)) {
      out(off) = 0
      java.util.Arrays.fill(out, off + 1, off + 1 + n, 0.toByte)
    } else {
      out(off) = 1
      val bits: Long = dt match {
        case LongType | TimestampType | TimestampNTZType => orderBits(row.getLong(ordinal), 8)
        case IntegerType | DateType => orderBits(row.getInt(ordinal).toLong & 0xFFFFFFFFL, 4)
        case ShortType => orderBits(row.getShort(ordinal).toLong & 0xFFFFL, 2)
        case ByteType => orderBits(row.getByte(ordinal).toLong & 0xFFL, 1)
        case DoubleType => orderDouble(row.getDouble(ordinal))
        case FloatType => orderFloat(row.getFloat(ordinal))
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
      putBE(out, off + 1, bits, n)
    }
    1 + n
  }
}

/** Multi-value encoding for `useMultipleValuesPerKey` stores (the Spark 4
  * `merge`/`valuesIterator` contract, used by transformWithState ListState):
  * values are stored as length-prefixed segments
  * `[4-byte len][payload]...`; `put` writes one segment, `merge` appends
  * one, `get` decodes the first, `valuesIterator` decodes all.
  */
object MultiValue {
  def encodeOne(value: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + value.length)
    writeInt(out, 0, value.length)
    System.arraycopy(value, 0, out, 4, value.length)
    out
  }

  def append(existing: Array[Byte], value: Array[Byte]): Array[Byte] = {
    val seg = encodeOne(value)
    val out = new Array[Byte](existing.length + seg.length)
    System.arraycopy(existing, 0, out, 0, existing.length)
    System.arraycopy(seg, 0, out, existing.length, seg.length)
    out
  }

  def decode(encoded: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var off = 0
    def hasNext: Boolean = off < encoded.length
    def next(): Array[Byte] = {
      val len = readInt(encoded, off)
      val v = java.util.Arrays.copyOfRange(encoded, off + 4, off + 4 + len)
      off += 4 + len
      v
    }
  }

  def first(encoded: Array[Byte]): Array[Byte] = decode(encoded).next()

  private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
      ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)
}
