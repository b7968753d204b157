package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming last-touch attribution: the latest-source state persists
  * across micro-batches through our providers; credit-then-update keeps
  * the strictly-before rule inside a batch; null credit when no source
  * has been seen; parity with the batch window operator under in-order
  * delivery.
  */
abstract class StreamingAttributionSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def backendName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-attr-$backendName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$backendName: credits latest prior source across batches; unsourced → null") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, String)]
    val attributed = StreamingAttribution.lastTouchStream(
      input.toDS().toDF("user_id", "event_id", "event_type"),
      targetType = "purchase", sourceType = "click")

    val query = attributed.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sattr_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sattr").toString)
      .start()

    // batch 1, arriving unsorted: u1 click(1) < click(3) < purchase(4)
    // within one batch → credit 3 (latest prior, not first); u2's
    // purchase(2) has no prior click → null even though a click(5)
    // arrives in the SAME batch (ord-after, strictness)
    input.addData((1L, 4L, "purchase"), (1L, 1L, "click"), (1L, 3L, "click"),
      (2L, 2L, "purchase"), (2L, 5L, "click"))
    query.processAllAvailable()
    val t = () => spark.table(s"sattr_$backendName").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(t() == Set((1L, 4L, Some(3L)), (2L, 2L, None)), s"batch 1: ${t()}")

    // batch 2: state remembered u1's click@3 and u2's click@5 through
    // the SPI — both purchases credit without any same-batch source
    input.addData((1L, 6L, "purchase"), (2L, 7L, "purchase"))
    query.processAllAvailable()
    assert(t() == Set((1L, 4L, Some(3L)), (2L, 2L, None),
      (1L, 6L, Some(3L)), (2L, 7L, Some(5L))), s"batch 2: ${t()}")
    query.stop()

    // parity: the batch window operator over the union of both batches
    // produces the identical attribution (deliveries were in order)
    val all = Seq((1L, 4L, "purchase"), (1L, 1L, "click"), (1L, 3L, "click"),
      (2L, 2L, "purchase"), (2L, 5L, "click"),
      (1L, 6L, "purchase"), (2L, 7L, "purchase"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", col("event_id"))
    val batch = graft.operators.Sessionize.lastTouch(all, "purchase", "click")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSet
    assert(batch == Set((4L, Some(3L)), (2L, None), (6L, Some(3L)), (7L, Some(5L))))
  }

  test(s"$backendName: a stale click expires at the TTL horizon even for a " +
      "continually ACTIVE entity") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // With TimeMode.ProcessingTime (any TTL'd state), shouldRunAnotherBatch
    // is unconditionally true: an AvailableNow run never self-terminates
    // and the perpetual no-data batches starve processAllAvailable's
    // noNewData wait. Same harness as StreamingDedupSuite's TTL test —
    // one long-running query, committed input rows counted via a
    // progress listener, assertions after polling for them.
    val input = MemoryStream[(Long, Long, String)]
    val attributed = StreamingAttribution.lastTouchStream(
      input.toDS().toDF("user_id", "event_id", "event_type"),
      targetType = "purchase", sourceType = "click",
      ttl = Some(java.time.Duration.ofSeconds(6)))

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

    val query = attributed.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sattr_ttl_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sattr-ttl").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()

    def awaitInput(total: Long): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (seen.get < total && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(seen.get >= total, s"timed out waiting for $total committed input rows")
    }
    def t(): Set[(Long, Long, Option[Any])] =
      spark.table(s"sattr_ttl_$backendName").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet

    try {
      // the click arms the window
      input.addData((1L, 1L, "click"))
      awaitInput(1)
      // inside the window: purchase credits the click. This is
      // TARGET-type activity — with the old unconditional state rewrite
      // it would re-arm the TTL and the click below would never expire.
      input.addData((1L, 2L, "purchase"))
      awaitInput(2)
      assert(t() == Set((1L, 2L, Some(1L))), s"inside window: ${t()}")

      // let the horizon pass; the entity was active (purchase@2) but
      // produced no NEW source event, so the click must be gone
      Thread.sleep(7000)
      input.addData((1L, 3L, "purchase"))
      awaitInput(3)
      assert(t() == Set((1L, 2L, Some(1L)), (1L, 3L, None)),
        s"after horizon: ${t()}")
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }
  }
}

class StreamingAttributionRocksDbSuite extends StreamingAttributionSuiteBase {
  def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  def backendName: String = "rocksdb"
}

class StreamingAttributionInMemorySuite extends StreamingAttributionSuiteBase {
  def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  def backendName: String = "inmemory"
}
