package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming token-budget admission: the per-source budget lives in
  * state and is enforced ACROSS micro-batches — a source that spends
  * its budget in batch 1 admits nothing in batch 5; an under-budget
  * source keeps admitting; an oversize first doc is admitted (a quota
  * never erases a stratum); every admitted doc is emitted exactly once.
  * ×2 SPI backends.
  */
abstract class StreamingQuotaSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-quota-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test(s"$suiteName: budget enforced across batches; oversize-first admitted; exactly once") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, String)]
    val admitted = StreamingQuota.tokenQuotaStream(
      input.toDS().toDF("doc_id", "source", "text"), budgetTokens = 10L)
    val query = admitted.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"squota_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-squota-$suiteName").toString)
      .start()
    def got(): Seq[(Long, String)] = spark.table(s"squota_$suiteName")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // batch 1: source A spends 4+5=9 of 10 over two docs (in doc_id
    // order); the 20-token doc 3 still enters (cum-before 9 < 10) — and
    // closes the gate. Source B's oversize FIRST doc is admitted alone.
    input.addData((1L, "A", words(4)), (2L, "A", words(5)),
      (3L, "A", words(20)), (10L, "B", words(50)))
    query.processAllAvailable()
    assert(got() == Seq((1L, "A"), (2L, "A"), (3L, "A"), (10L, "B")),
      s"batch 1 admissions: ${got()}")

    // batch 2: A and B are both spent — nothing admitted, even tiny
    // docs; a FRESH source admits normally
    input.addData((4L, "A", words(1)), (11L, "B", words(1)),
      (20L, "C", words(3)))
    query.processAllAvailable()
    assert(got() == Seq((1L, "A"), (2L, "A"), (3L, "A"), (10L, "B"), (20L, "C")),
      s"spent sources must stay closed: ${got()}")

    // batch 3: C has 3 of 10 spent — still admitting; null text never
    // spends or passes
    input.addData((21L, "C", words(5)), (22L, "C", null.asInstanceOf[String]))
    query.processAllAvailable()
    assert(got() == Seq((1L, "A"), (2L, "A"), (3L, "A"), (10L, "B"),
      (20L, "C"), (21L, "C")), s"batch 3: ${got()}")
    query.stop()
  }

  test(s"$suiteName: within-batch admission is doc_id-ordered (replay-deterministic)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, String)]
    val admitted = StreamingQuota.tokenQuotaStream(
      input.toDS().toDF("doc_id", "source", "text"), budgetTokens = 6L)
    val query = admitted.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"squotao_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-squotao-$suiteName").toString)
      .start()
    // delivered out of id order: the processor folds 5,6,7 by doc_id —
    // 5 (4 toks, cum 4) admits, 6 (4 toks, cum-before 4 < 6) admits and
    // closes, 7 never enters
    input.addData((7L, "X", words(2)), (5L, "X", words(4)), (6L, "X", words(4)))
    query.processAllAvailable()
    val ids = spark.table(s"squotao_$suiteName").collect()
      .map(_.getLong(0)).sorted.toSeq
    query.stop()
    assert(ids == Seq(5L, 6L), s"id-ordered admission: $ids")
  }
}

class StreamingQuotaRocksDbSuite extends StreamingQuotaSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingQuotaInMemorySuite extends StreamingQuotaSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
