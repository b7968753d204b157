package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Multimodal
import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming clip-level video near-dup: the two chained stateful
  * operators reproduce the batch pair set across micro-batches, and the
  * threshold crossing emits each clip pair exactly once.
  */
abstract class StreamingVideoDedupSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-videodedup-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Keyframe fingerprint rows (docId, frameIdx, hi, lo, nKey) computed
    * by the BATCH fingerprint path over the shared formula clips. */
  private def rowsFor(ids: Seq[Long]): Seq[(Long, Int, Long, Long, Int)] = {
    val sql = spark
    import sql.implicits._
    val hashes = Multimodal.dHashFrames(
        Multimodal.withVideoKeyframes(ids.toDF("doc_id"))).toDF()
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val nKey = hashes.groupBy(_._1).map { case (d, fs) => d -> fs.length }
    hashes.map { case (d, f, hi, lo) => (d, f, hi, lo, nKey(d)) }.toSeq
  }

  test(s"$suiteName: replay across micro-batches equals batch videoNearDupClips") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ids = Seq(0L, 25L, 50L, 77L, 1L) // 0/25/50 share seed 0; 77→2, 1→1
    val input = MemoryStream[(Long, Int, Long, Long, Int)]
    val pairs = StreamingVideoDedup.clipPairsStream(
      input.toDS().toDF("doc_id", "frame_idx", "dhash_hi", "dhash_lo", "n_key"))
    val q = pairs.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"svid_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-svid-$suiteName").toString)
      .start()
    // clips arrive whole, split across two micro-batches — pairing must
    // reach back through state
    input.addData(rowsFor(Seq(0L, 25L, 1L)): _*)
    q.processAllAvailable()
    input.addData(rowsFor(Seq(50L, 77L)): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(s"svid_$suiteName").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    val batch = Multimodal.videoNearDupClips(
        Multimodal.dHashFrames(Multimodal.withVideoKeyframes(
          ids.toDF("doc_id"))).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.keySet === batch.keySet,
      s"emitted pair set must equal batch: stream=$streamed batch=$batch")
    streamed.foreach { case (k, (m, nk)) =>
      assert(nk.toLong === batch(k)._2, s"nKeyA parity for $k")
      assert(m <= batch(k)._1, s"at-crossing count bounded by final for $k")
    }
  }

  test(s"$suiteName: the minFrac crossing emits exactly once; late matches don't re-emit") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clip0 = rowsFor(Seq(0L))                       // 2 keyframes: 0, 8
    val clip25 = rowsFor(Seq(25L))                     // 5 keyframes, seed 0
    val input = MemoryStream[(Long, Int, Long, Long, Int)]
    val pairs = StreamingVideoDedup.clipPairsStream(
      input.toDS().toDF("doc_id", "frame_idx", "dhash_hi", "dhash_lo", "n_key"),
      minFrac = 1.0)                                    // both of clip 0's frames
    val q = pairs.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"svid1_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-svid1-$suiteName").toString)
      .start()
    def emitted(): Seq[(Long, Long, Int, Int)] =
      spark.table(s"svid1_$suiteName").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq

    input.addData(clip0: _*)
    q.processAllAvailable()
    input.addData(clip25.filter(_._2 == 0): _*)        // 1/2 matched — below
    q.processAllAvailable()
    assert(emitted().isEmpty, s"below threshold must not emit: ${emitted()}")
    input.addData(clip25.filter(r => r._2 == 8 || r._2 == 16): _*)
    q.processAllAvailable()
    assert(emitted() === Seq((0L, 25L, 2, 2)), s"crossing emits once: ${emitted()}")
    // a re-arriving already-matched frame must not re-emit
    input.addData(clip25.filter(_._2 == 0): _*)
    q.processAllAvailable()
    q.stop()
    assert(emitted() === Seq((0L, 25L, 2, 2)), s"no re-emission: ${emitted()}")
  }
}

class StreamingVideoDedupRocksDbSuite extends StreamingVideoDedupSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingVideoDedupInMemorySuite extends StreamingVideoDedupSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
