package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming duplicated-gram census: per-gram doc census in SPI state;
  * every position of a gram that reaches two DISTINCT docs is emitted
  * exactly once — including the held-back first-doc occurrences released
  * at the crossing — and within-doc repeats alone never fire (the q90
  * cross-doc dup definition). Replay ≡ the batch dup-position set.
  */
abstract class StreamingDupGramsSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-dupgrams-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: crossing releases held positions once; within-doc never fires") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Int, Long)] // (doc_id, pos, gram)
    val dups = StreamingDupGrams.dupPositionsStream(
      input.toDS().toDF("doc_id", "pos", "gram"))
    val query = dups.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sdg_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sdg-$suiteName").toString)
      .start()
    def got(): Seq[(Long, Int)] =
      spark.table(s"sdg_$suiteName").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq

    // batch 1: gram 10 twice in doc 1 (within-doc repeat — held, not
    // fired), gram 20 once in doc 1
    input.addData((1L, 1, 10L), (1L, 2, 10L), (1L, 3, 20L))
    query.processAllAvailable()
    assert(got().isEmpty, s"single-doc grams must stay silent: ${got()}")

    // batch 2: doc 2 carries gram 10 — the crossing releases BOTH held
    // doc-1 positions plus the arrival, each exactly once
    input.addData((2L, 5, 10L))
    query.processAllAvailable()
    assert(got().sorted == Seq((1L, 1), (1L, 2), (2L, 5)),
      s"crossing must release held + arrival once each: ${got().sorted}")

    // batch 3: more gram-10 occurrences emit through immediately; gram 20
    // stays single-doc silent; a fresh gram 30 pair crosses in one batch
    input.addData((3L, 9, 10L), (1L, 4, 20L), (4L, 1, 30L), (5L, 2, 30L))
    query.processAllAvailable()
    val fin = got().sorted
    assert(fin == Seq((1L, 1), (1L, 2), (2L, 5), (3L, 9), (4L, 1), (5L, 2)),
      s"emit-through + same-batch crossing, no re-emissions: $fin")
    query.stop()

    // replay ≡ batch: the emitted set is exactly the positions whose gram
    // spans ≥2 distinct docs (gram 20 never does)
    val all = Seq((1L, 1, 10L), (1L, 2, 10L), (1L, 3, 20L), (2L, 5, 10L),
      (3L, 9, 10L), (1L, 4, 20L), (4L, 1, 30L), (5L, 2, 30L))
    val dupGrams = all.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val batchExpect = all.filter(o => dupGrams(o._3)).map(o => (o._1, o._2)).sorted
    assert(fin == batchExpect, s"stream $fin must equal batch $batchExpect")
  }
}

class StreamingDupGramsRocksDbSuite extends StreamingDupGramsSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingDupGramsInMemorySuite extends StreamingDupGramsSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
