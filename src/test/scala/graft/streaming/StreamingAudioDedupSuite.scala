package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming perceptual audio dedup: the 4×8-bit band index lives in our
  * state providers; pairs surface within AND across batches; distant
  * fingerprints never pair; the prospective bucket cap silences
  * degenerate fingerprint values; and a full replay matches the batch
  * [[graft.operators.Multimodal.audioNearDupPairs]] pair set (same
  * bands via the shared `audioBands` definition, same popcount hamming)
  * — including on REAL WAV-decoded fingerprints.
  */
abstract class StreamingAudioDedupSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-auddedup-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // (doc_id, fingerprint): 1 and 2 differ in one low bit (hamming 1);
  // 3 is distant from both; 4 is an exact copy of 1.
  private val f1 = (1L, 0x12345678L)
  private val f2 = (2L, 0x12345679L)
  private val f3 = (3L, 0xEDCBA987L)
  private val f4 = (4L, 0x12345678L)

  test(s"$suiteName: pairs within and across batches; distant never pairs") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long)]
    val pairs = StreamingAudioDedup.audioPairsStream(
      input.toDS().toDF("doc_id", "fingerprint"), maxHamming = 3)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"saud_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-saud-$suiteName").toString)
      .start()
    def got(): Set[(Long, Long, Long)] =
      spark.table(s"saud_$suiteName").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch 1: the near pair arrives together → (1,2); 3 stays alone
    input.addData(f1, f2, f3)
    query.processAllAvailable()
    assert(got() == Set((1L, 2L, 1L)), s"batch 1: ${got()}")

    // batch 2: 4 (copy of 1) arrives — the SPI index remembers batch 1:
    // (1,4) hamming 0 and (2,4) hamming 1 join the earlier pair
    input.addData(f4)
    query.processAllAvailable()
    assert(got() == Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)),
      s"batch 2: ${got()}")
    query.stop()
  }

  test(s"$suiteName: replay ≡ batch pairs (incl. real WAV decode); cap admits nothing") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // REAL pipeline parity: fingerprints decoded from actual WAV blobs
    // (ids chosen so same-(id % …) waveform families produce near-dups
    // through the shared sample formula)
    val fps = graft.operators.Multimodal.audioFingerprint(
        graft.operators.Multimodal.withWavMedia(
          (1L to 40L).toDF("doc_id")))
      .collect().map(r => (r.doc_id, r.fingerprint)).toSeq

    val input = MemoryStream[(Long, Long)]
    val pairs = StreamingAudioDedup.audioPairsStream(
      input.toDS().toDF("doc_id", "fingerprint"), maxHamming = 3)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"saudp_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-saudp-$suiteName").toString)
      .start()
    fps.grouped(7).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    // a pair colliding in k bands emits ≤ k times — dedupe as callers do
    val streamed = spark.table(s"saudp_$suiteName").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    query.stop()

    val batch = graft.operators.Multimodal.audioNearDupPairs(
        fps.toDF("doc_id", "fingerprint"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "degenerate fixture: no batch near-dup pairs")
    assert(streamed == batch, s"stream $streamed must equal batch $batch")

    // cap: copies of one fingerprint through a cap-1 stream emit nothing
    val capIn = MemoryStream[(Long, Long)]
    val capped = StreamingAudioDedup.audioPairsStream(
      capIn.toDS().toDF("doc_id", "fingerprint"),
      maxHamming = 0, maxBucketSize = 1)
    val capQ = capped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"saudc_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-saudc-$suiteName").toString)
      .start()
    capIn.addData((1L to 10L).map(i => (i, 7L)): _*)
    capQ.processAllAvailable()
    assert(spark.table(s"saudc_$suiteName").count() == 0L,
      "cap-1 buckets admit one member and emit no pairs")
    capQ.stop()
  }
}

class StreamingAudioDedupRocksDbSuite extends StreamingAudioDedupSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingAudioDedupInMemorySuite extends StreamingAudioDedupSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
