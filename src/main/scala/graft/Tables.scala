package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated TPC-H-ish star schema
  * (TESTDATA.md). One parquet file per table under the scale-factor dir.
  *
  * Scale notes: at 100 TB these would be partitioned/bucketed datasets; the
  * loaders keep the access path declarative (`spark.read.parquet`) so
  * Catalyst performs column pruning + predicate pushdown into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Events with `ts` normalized to a nanos-since-epoch long REGARDLESS of
    * the parquet physical type. The generator has shipped `ts` both as
    * TIMESTAMP(NANOS) (which `nanosAsLong=true` surfaces as a long) and as
    * TIMESTAMP_MICROS (which arrives as TIMESTAMP_NTZ); in the wild this
    * column WILL arrive in either flavor, so the loader absorbs the
    * difference once and every consumer keeps pure integer-ns arithmetic —
    * exact, engine-portable, timezone-free.
    *
    * The NTZ branch is pure NAIVE arithmetic — `timestampdiff(MICROSECOND)`
    * against an NTZ epoch literal — so the naive wall-clock is read as UTC
    * regardless of the session timezone (an NTZ→timestamp cast would
    * silently interpret it in the SESSION zone and shift the instant by
    * the zone offset; TablesDriftSuite pins this under Asia/Tokyo). This
    * matches DuckDB's `epoch_ns(ts)` reading of the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw // TIMESTAMP(NANOS) read via nanosAsLong
      case TimestampNTZType =>
        raw.withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)") * 1000L)
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other — expected long, timestamp, or timestamp_ntz")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
