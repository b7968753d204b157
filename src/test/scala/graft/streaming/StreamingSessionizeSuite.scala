package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming sessionization twin: closed sessions emitted via
  * session_window + watermark over OUR state providers equal the batch
  * `Sessionize.sessions` rollup on the same events, including the
  * inclusive-gap boundary (`next - prev == gap` stays one session).
  */
abstract class StreamingSessionizeSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def backendName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-sessionize-$backendName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ns(sec: Double): Long = (sec * 1e9).toLong

  test(s"$backendName: closed sessions match the batch rollup, boundary inclusive") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val gapNs = ns(10) // 10 s inactivity gap
    val input = MemoryStream[(Long, Long, Long)] // (user_id, ts, event_id)
    val sessions = StreamingSessionize.sessionsStream(
      input.toDS().toDF("user_id", "ts", "event_id"),
      gapMicros = gapNs / 1000, delay = "10 seconds")

    val query = sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"ssess_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssess").toString)
      .start()

    // u1: burst (0,5,6 s) then a second session (30,31 s)
    // u2: two singleton sessions (3 s; 20 s — 17 s gap > 10 s)
    // u3: EXACT boundary — 40 s and 50 s, delta == gap ⇒ ONE session
    //     in the batch rule; the +1µs window must reproduce that
    // u4: one µs past the boundary (60 s, 70.000001 s) ⇒ TWO sessions
    val batch1 = Seq(
      (1L, ns(0), 1L), (1L, ns(5), 2L), (1L, ns(6), 3L), (2L, ns(3), 4L))
    val batch2 = Seq(
      (1L, ns(30), 5L), (1L, ns(31), 6L), (2L, ns(20), 7L),
      (3L, ns(40), 8L), (3L, ns(50), 9L),
      (4L, ns(60), 10L), (4L, ns(70) + 1000L, 11L))
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    // watermark pushers: drive the watermark far past every session close
    // (two pushes absorb the one-batch watermark lag)
    input.addData((99L, ns(1000), 12L))
    query.processAllAvailable()
    input.addData((99L, ns(2000), 13L))
    query.processAllAvailable()

    val got = spark.table(s"ssess_$backendName")
      .filter($"user_id" < 99L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val expected = graft.operators.Sessionize
      .sessions((batch1 ++ batch2).toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapNs)
      .filter($"user_id" < 99L).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2))).toSet

    // sanity on the shape itself, independent of the batch operator
    assert(expected.contains((3L, ns(40), ns(50), 2L)),
      s"boundary case collapsed wrong in batch: $expected")
    assert(expected.count(_._1 == 4L) == 2, s"u4 must have 2 sessions: $expected")
    assert(got == expected, s"streaming $got != batch $expected")
    query.stop()
  }
}

class StreamingSessionizeRocksDbSuite extends StreamingSessionizeSuiteBase {
  def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  def backendName: String = "rocksdb"
}

class StreamingSessionizeInMemorySuite extends StreamingSessionizeSuiteBase {
  def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  def backendName: String = "inmemory"
}
