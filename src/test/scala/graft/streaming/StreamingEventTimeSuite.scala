package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Out-of-order tolerance of the event-time funnel/attribution variants:
  * events delivered in the WRONG order across micro-batches (but within
  * the watermark delay) must fold in ordinal order and match the batch
  * operator — the exact scenario the in-order processors document as
  * their contract gap (VERDICT r5 "what's missing" #2).
  */
abstract class StreamingEventTimeSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def backendName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-eventtime-$backendName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test(s"$backendName: event-time funnel folds reordered deliveries in ordinal order") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val advances = StreamingFunnel.funnelStreamEventTime(
      input.toDS().toDF("user_id", "event_id", "event_type", "ts"),
      Seq("view", "click", "purchase"), watermarkDelay = "25 seconds")

    val query = advances.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"etfunnel_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-etfunnel").toString)
      .start()

    // u1's true order is view@1(t10) → click@3(t30) → purchase@5(t50),
    // but the CLICK arrives first. The in-order processor would discard
    // it (no view yet) and u1 would stall at step 0 forever; the
    // event-time variant must recover the full funnel.
    input.addData((1L, 3L, "click", ts(30)))
    query.processAllAvailable()
    input.addData((1L, 1L, "view", ts(10))) // late by arrival, in time by wm
    query.processAllAvailable()
    input.addData((1L, 5L, "purchase", ts(50)))
    query.processAllAvailable()
    // watermark pushers: drive wm far past t50 so every buffered event
    // finalizes (two pushes absorb the one-batch watermark lag)
    input.addData((99L, 1L, "view", ts(200)))
    query.processAllAvailable()
    input.addData((99L, 2L, "view", ts(400)))
    query.processAllAvailable()

    val got = spark.table(s"etfunnel_$backendName").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val u1 = got.filter(_._1 == 1L)
    assert(u1 == Set((1L, 0, 1L), (1L, 1, 3L), (1L, 2, 5L)),
      s"u1 advances: $u1")
    query.stop()

    // parity with the batch operator over the same events
    val all = Seq((1L, 1L, "view"), (1L, 3L, "click"), (1L, 5L, "purchase"))
      .toDF("user_id", "event_id", "event_type")
    val batch = graft.operators.Sessionize.funnel(all, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(batch == Set((1L, 1L, 3L, 5L)))
  }

  test(s"$backendName: event-time last-touch credits a late-arriving earlier source") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val attributed = StreamingAttribution.lastTouchStreamEventTime(
      input.toDS().toDF("user_id", "event_id", "event_type", "ts"),
      targetType = "purchase", sourceType = "click",
      watermarkDelay = "40 seconds")

    val query = attributed.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"etattr_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-etattr").toString)
      .start()

    // the purchase@5(t50) arrives BEFORE its click@2(t20): the in-order
    // processor would emit sourceId=None the moment the purchase lands;
    // the event-time variant waits for the watermark and must credit it
    input.addData((1L, 5L, "purchase", ts(50)))
    query.processAllAvailable()
    input.addData((1L, 2L, "click", ts(20)))
    query.processAllAvailable()
    // second target AFTER the click by ordinal, delivered in yet another
    // batch — same credit, proves state carries the folded source
    input.addData((1L, 9L, "purchase", ts(90)))
    query.processAllAvailable()
    input.addData((99L, 1L, "view", ts(300)))
    query.processAllAvailable()
    input.addData((99L, 2L, "view", ts(600)))
    query.processAllAvailable()

    val got = spark.table(s"etattr_$backendName").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set((1L, 5L, Some(2L)), (1L, 9L, Some(2L))), s"got: $got")
    query.stop()
  }

  test(s"$backendName: the event-time attribution horizon expires a stale " +
      "source for a continually active entity") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, String, Timestamp)]
    // 60 s attribution window measured on EVENT time: purchases more than
    // 60 s (of event time) after the click get no credit, no matter how
    // active the entity stays in between
    val attributed = StreamingAttribution.lastTouchStreamEventTime(
      input.toDS().toDF("user_id", "event_id", "event_type", "ts"),
      targetType = "purchase", sourceType = "click",
      watermarkDelay = "10 seconds",
      horizon = Some(java.time.Duration.ofSeconds(60)))

    val query = attributed.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"etattrh_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-etattrh").toString)
      .start()

    // click@1(t10); purchase@2(t40) inside the window; purchase@3(t80)
    // outside it (80-10 > 60) even though the entity was active at t40
    input.addData((1L, 1L, "click", ts(10)), (1L, 2L, "purchase", ts(40)))
    query.processAllAvailable()
    input.addData((1L, 3L, "purchase", ts(80)))
    query.processAllAvailable()
    // watermark pushers (two, to absorb the one-batch watermark lag)
    input.addData((99L, 1L, "view", ts(300)))
    query.processAllAvailable()
    input.addData((99L, 2L, "view", ts(600)))
    query.processAllAvailable()

    val got = spark.table(s"etattrh_$backendName").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set((1L, 2L, Some(1L)), (1L, 3L, None)), s"got: $got")
    query.stop()
  }
}

class StreamingEventTimeRocksDbSuite extends StreamingEventTimeSuiteBase {
  def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  def backendName: String = "rocksdb"
}

class StreamingEventTimeInMemorySuite extends StreamingEventTimeSuiteBase {
  def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  def backendName: String = "inmemory"
}
