package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Session/writer helpers mirroring the reference's implicits surface
  * (reference rocksdb/implicits.scala:32-38, redis/implicits.scala:8-16)
  * re-expressed without reflection: the TTL writer helper takes the query
  * name and checkpoint explicitly instead of reading the writer's private
  * `extraOptions` (reference rocksdb/implicits.scala:40-79 — a reflection
  * hack Spark 4 would break anyway; SURVEY.md §2.A machinery table).
  */
object implicits {

  val ProviderClassKey = "spark.sql.streaming.stateStore.providerClass"

  implicit class GraftSessionBuilder(val builder: SparkSession.Builder) extends AnyVal {
    /** Route all stateful-streaming state through our RocksDB provider. */
    def useRocksDbStateStore(): SparkSession.Builder =
      builder.config(ProviderClassKey, classOf[RocksDbStateStoreProvider].getName)

    /** Route state through the in-memory provider (external-KV stand-in). */
    def useInMemoryStateStore(): SparkSession.Builder =
      builder.config(ProviderClassKey, classOf[InMemoryStateStoreProvider].getName)

    /** Route state through the external-KV seam (embedded server; a real
      * Redis/Aerospike `KvClient` adapter drops in — the reference's
      * `useRedisDBStateStore()` role). */
    def useKvStateStore(): SparkSession.Builder =
      builder.config(ProviderClassKey, classOf[KvStateStoreProvider].getName)
  }

  implicit class GraftStateTimeout[T](val writer: DataStreamWriter[T]) extends AnyVal {
    /** Configure state TTL for a named query and wire the query's name +
      * checkpoint so the provider can recover the per-query TTL key from
      * the checkpoint path (semantics of reference README.md:38-108).
      *
      * `expirySecs`: -1 infinite (default), 0 stateless, n>0 expire after
      * n seconds of inactivity.
      */
    def stateTimeout(
        spark: SparkSession,
        queryName: String,
        expirySecs: Long,
        checkpointLocation: String): DataStreamWriter[T] = {
      spark.conf.set(s"${TtlConf.ExpiryKey}.$queryName", math.max(expirySecs, -1L))
      writer
        .queryName(queryName)
        .option("checkpointLocation",
          checkpointLocation.stripSuffix("/") + "/" + queryName)
    }
  }
}
