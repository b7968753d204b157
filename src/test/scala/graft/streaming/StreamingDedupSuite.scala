package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Incremental LSH near-dup detection with the bucket index living in our
  * state providers: pairs surface both within a batch and ACROSS batches
  * (the bucket members persisted through the SPI), unrelated docs never
  * pair, and the estimate matches the batch operator's signature math.
  */
abstract class StreamingDedupSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-dedup-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: near-dup pairs across and within batches, no false pairs") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hill"
    val nearCopy = base.replace("rain", "snow")
    val unrelatedA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val unrelatedB = unrelatedA // exact copy, same batch

    val input = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.nearDupPairs(
      input.toDS().toDF("doc_id", "text"), threshold = 0.5)

    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sdedup_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sdedup-$suiteName").toString)
      .start()

    // batch 1: the future near-dup's other half is NOT here yet
    input.addData((1L, base), (2L, unrelatedA))
    query.processAllAvailable()
    val afterB1 = spark.table(s"sdedup_$suiteName").collect()
    assert(afterB1.isEmpty, s"no pairs expected in batch 1: ${afterB1.mkString(",")}")

    // batch 2: doc 3 near-dups doc 1 (cross-batch, via persisted bucket
    // state); doc 4 exactly copies doc 2 (within-batch)
    input.addData((3L, nearCopy), (4L, unrelatedB))
    query.processAllAvailable()

    val got = spark.table(s"sdedup_$suiteName")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 3L), (2L, 4L)),
      s"expected exactly {(1,3),(2,4)}, got ${got.keySet}")
    assert(got((2L, 4L)) == 1.0, "exact copy must estimate Jaccard 1.0")
    assert(got((1L, 3L)) >= 0.5 && got((1L, 3L)) < 1.0,
      s"near copy estimate out of range: ${got((1L, 3L))}")
    query.stop()
  }

  test(s"$suiteName: full buckets stop admitting (skew guard)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // every doc identical → all land in the same buckets; cap 3 admits
    // only the first 3 docs per bucket, so pair count stays 3-choose-2
    // instead of growing O(n²)
    val sameText = "identical content repeated verbatim in every single document here"
    val input = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.nearDupPairs(
      input.toDS().toDF("doc_id", "text"), threshold = 0.5, maxBucketSize = 3)

    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sdedupcap_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sdedupcap-$suiteName").toString)
      .start()

    input.addData((1L to 10L).map(i => (i, sameText)): _*)
    query.processAllAvailable()

    // row order within a batch group is not contractual, so the three
    // ADMITTED docs are unspecified — what the cap guarantees is the
    // pair count: 3-choose-2 over one triangle of docs, not 10-choose-2
    val got = spark.table(s"sdedupcap_$suiteName")
      .select("docA", "docB").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = got.flatMap(p => Set(p._1, p._2))
    assert(got.size == 3 && docs.size == 3,
      s"cap 3 must bound pairs to one 3-doc triangle, got $got")
    query.stop()
  }

  test(s"$suiteName: TTL'd bucket index forgets docs past the horizon") {
    // ONE long-running query, synchronized by a progress listener. With
    // TimeMode.ProcessingTime, shouldRunAnotherBatch is unconditionally
    // true, which breaks both standard sync tools: an AvailableNow run
    // never self-terminates (a restart harness burns its await timeout
    // and leaves a zombie query on the checkpoint), and the perpetual
    // no-data batches starve processAllAvailable's noNewData wait. So:
    // count COMMITTED source rows via the listener and poll for them.
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val text = "identical content repeated verbatim across every arriving document"
    val input = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.nearDupPairs(
      input.toDS().toDF("doc_id", "text"), threshold = 0.5,
      ttl = Some(java.time.Duration.ofSeconds(5)))

    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        seen.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sdedupttl_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sdedupttl-$suiteName").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()

    def awaitInput(total: Long): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (seen.get < total && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(seen.get >= total, s"timed out waiting for $total committed input rows")
    }
    def pairsSoFar(): Set[(Long, Long)] =
      spark.table(s"sdedupttl_$suiteName")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    try {
      input.addData((1L, text))
      awaitInput(1)
      assert(pairsSoFar().isEmpty)

      Thread.sleep(7000) // well past the 5 s horizon: doc 1 must be forgotten
      input.addData((2L, text))
      awaitInput(2)
      assert(pairsSoFar().isEmpty, "expired member must not pair")

      input.addData((3L, text)) // doc 2 is well inside the horizon → (2,3); (1,3) must not
      awaitInput(3)
      assert(pairsSoFar() == Set((2L, 3L)))
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }
  }
}

class InMemoryStreamingDedupSuite extends StreamingDedupSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}

class RocksDbStreamingDedupSuite extends StreamingDedupSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}
