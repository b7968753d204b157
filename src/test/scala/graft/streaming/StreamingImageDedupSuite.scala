package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming perceptual image dedup: the band index lives in our state
  * providers; pairs surface within AND across batches; distant hashes
  * never pair; the prospective bucket cap silences degenerate hash
  * values; and a full replay matches the batch
  * [[graft.operators.Multimodal.imageNearDupPairs]] pair set (same
  * 4×16-bit bands, same popcount-on-halves hamming).
  */
abstract class StreamingImageDedupSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-imgdedup-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // (doc_id, dhash_hi, dhash_lo): 1 and 2 differ in one low bit
  // (hamming 1); 3 is distant from both; 4 is an exact copy of 1.
  private val h1 = (1L, 0x12345678L, 0x0F0F0F0FL)
  private val h2 = (2L, 0x12345678L, 0x0F0F0F0EL)
  private val h3 = (3L, 0xEDCBA987L, 0xF0F0F0F0L)
  private val h4 = (4L, 0x12345678L, 0x0F0F0F0FL)

  test(s"$suiteName: pairs within and across batches; distant never pairs") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, Long)]
    val pairs = StreamingImageDedup.imagePairsStream(
      input.toDS().toDF("doc_id", "dhash_hi", "dhash_lo"), maxHamming = 3)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"simg_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-simg-$suiteName").toString)
      .start()
    def got(): Set[(Long, Long, Long)] =
      spark.table(s"simg_$suiteName").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch 1: the near pair arrives together → (1,2); 3 stays alone
    input.addData(h1, h2, h3)
    query.processAllAvailable()
    assert(got() == Set((1L, 2L, 1L)), s"batch 1: ${got()}")

    // batch 2: 4 (copy of 1) arrives — the SPI index remembers batch 1:
    // (1,4) hamming 0 and (2,4) hamming 1 join the earlier pair
    input.addData(h4)
    query.processAllAvailable()
    assert(got() == Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)),
      s"batch 2: ${got()}")
    query.stop()
  }

  test(s"$suiteName: replay matches batch pairs; full bucket admits nothing") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Seq(h1, h2, h3, h4)
    val input = MemoryStream[(Long, Long, Long)]
    val pairs = StreamingImageDedup.imagePairsStream(
      input.toDS().toDF("doc_id", "dhash_hi", "dhash_lo"), maxHamming = 3)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"simgp_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-simgp-$suiteName").toString)
      .start()
    all.grouped(2).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    // a pair colliding in k bands emits ≤ k times — dedupe as callers do
    val streamed = spark.table(s"simgp_$suiteName").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    query.stop()

    val batch = graft.operators.Multimodal.imageNearDupPairs(
        all.toDF("doc_id", "dhash_hi", "dhash_lo"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream $streamed must equal batch $batch")

    // cap: 70 copies of one hash through a cap-64 stream emit pairs only
    // while the bucket admits — strictly fewer than the uncapped 70·69/2,
    // and nothing at cap 1
    val capIn = MemoryStream[(Long, Long, Long)]
    val capped = StreamingImageDedup.imagePairsStream(
      capIn.toDS().toDF("doc_id", "dhash_hi", "dhash_lo"),
      maxHamming = 0, maxBucketSize = 1)
    val capQ = capped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"simgc_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-simgc-$suiteName").toString)
      .start()
    capIn.addData((1L to 10L).map(i => (i, 7L, 7L)): _*)
    capQ.processAllAvailable()
    assert(spark.table(s"simgc_$suiteName").count() == 0L,
      "cap-1 buckets admit one member and emit no pairs")
    capQ.stop()
  }
}

class StreamingImageDedupRocksDbSuite extends StreamingImageDedupSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingImageDedupInMemorySuite extends StreamingImageDedupSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
