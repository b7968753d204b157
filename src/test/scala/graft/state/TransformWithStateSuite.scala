package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

/** transformWithState (Spark 4 arbitrary-state v2 — the modern home of the
  * reference's TTL feature, SURVEY.md §1.4) on our providers. Exercises
  * the Spark 4 SPI surface the reference predates: column families
  * (one per state variable + internal metadata/timer families), ListState
  * (multi-value merge + valuesIterator), MapState (prefix scan), and
  * native TTLConfig.
  */
class CountAndRecentProcessor extends StatefulProcessor[Int, (Int, String), (Int, Int, String)] {
  @transient private var count: ValueState[Int] = _
  @transient private var recent: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Int]("count", Encoders.scalaInt, TTLConfig.NONE)
    recent = getHandle.getListState[String]("recent", Encoders.STRING, TTLConfig.NONE)
  }

  override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
                               timerValues: TimerValues): Iterator[(Int, Int, String)] = {
    val items = rows.map(_._2).toSeq
    val newCount = (if (count.exists()) count.get() else 0) + items.size
    count.update(newCount)
    items.foreach(recent.appendValue)
    val all = recent.get().mkString(",")
    Iterator.single((key, newCount, all))
  }
}

/** MapState routes through prefixScan (composite user key = grouping key +
  * map key with a PrefixKeyScanStateEncoderSpec column family). */
class PerCategoryCounter extends StatefulProcessor[Int, (Int, String), (Int, String, Long)] {
  @transient private var perCat: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    perCat = getHandle.getMapState[String, Long]("perCat",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
                               timerValues: TimerValues): Iterator[(Int, String, Long)] = {
    rows.foreach { case (_, cat) =>
      val cur = if (perCat.containsKey(cat)) perCat.getValue(cat) else 0L
      perCat.updateValue(cat, cur + 1)
    }
    // full-map read exercises the prefix scan over this grouping key
    perCat.iterator().map { case (cat, n) => (key, cat, n) }
  }
}

/** ValueState with Spark 4 native TTLConfig — the modern home of the
  * reference's TTL feature (SURVEY.md §1.4). Requires
  * TimeMode.ProcessingTime; Spark stores expiry in a TTL column family on
  * our provider.
  */
class TtlCountProcessor(ttlMs: Long)
    extends StatefulProcessor[Int, (Int, String), (Int, Int)] {
  @transient private var count: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Int]("count", Encoders.scalaInt,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))
  }

  override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
                               timerValues: TimerValues): Iterator[(Int, Int)] = {
    val n = (if (count.exists()) count.get() else 0) + rows.size
    count.update(n)
    Iterator.single((key, n))
  }
}

/** Processing-time timers: sessionization shape — each input (re)arms a
  * timer (delay ms carried in the value); when it fires,
  * handleExpiredTimer emits the session total and clears state. Timer
  * state lives in a dedicated timer column family keyed with
  * RangeKeyScanStateEncoderSpec (expiry-ordered), so this drives the
  * range-scan encoder through a real operator. A "cancel" input
  * exercises listTimers + deleteTimer.
  *
  * AvailableNow semantics (observed): after the data batches, Spark keeps
  * running no-data batches until no registered timer is pending, so a
  * single run carries arm → fire end-to-end.
  */
class SessionFlushProcessor extends StatefulProcessor[Int, (Int, String), (Int, String, Int)] {
  @transient private var count: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Int]("count", Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
                               timerValues: TimerValues): Iterator[(Int, String, Int)] = {
    val items = rows.toSeq
    if (items.exists(_._2 == "cancel")) {
      getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
      count.clear()
      Iterator.single((key, "cancelled", 0))
    } else {
      val n = (if (count.exists()) count.get() else 0) + items.size
      count.update(n)
      // re-arm: drop any previous timer, fire delayMs from now
      getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + items.map(_._2.toLong).max)
      Iterator.single((key, "open", n))
    }
  }

  override def handleExpiredTimer(key: Int, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[(Int, String, Int)] = {
    val n = if (count.exists()) count.get() else 0
    count.clear()
    Iterator.single((key, "flushed", n))
  }
}

/** Event-time timers: a session flushes when the WATERMARK (not the wall
  * clock) passes one second after the session's latest event. Exercises
  * TimeMode.EventTime — timer expiry driven by watermark progress from
  * later data, deterministic under replay, where the processing-time
  * variant depends on the machine clock.
  */
class EventTimeFlushProcessor
    extends StatefulProcessor[Int, (Int, java.sql.Timestamp), (Int, String, Int)] {
  @transient private var count: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Int]("count", Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[(Int, java.sql.Timestamp)],
                               timerValues: TimerValues): Iterator[(Int, String, Int)] = {
    val items = rows.toSeq
    val n = (if (count.exists()) count.get() else 0) + items.size
    count.update(n)
    getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
    getHandle.registerTimer(items.map(_._2.getTime).max + 1000)
    Iterator.single((key, "open", n))
  }

  override def handleExpiredTimer(key: Int, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[(Int, String, Int)] = {
    val n = if (count.exists()) count.get() else 0
    count.clear()
    Iterator.single((key, "flushed", n))
  }
}

/** Migration path from an existing system: state seeded from a batch
  * Dataset via StatefulProcessorWithInitialState. */
class CountWithInitProcessor
    extends StatefulProcessorWithInitialState[Int, (Int, String), (Int, Int), Int] {
  @transient private var count: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Int]("count", Encoders.scalaInt, TTLConfig.NONE)

  override def handleInitialState(key: Int, initialState: Int,
                                  timerValues: TimerValues): Unit =
    count.update(initialState)

  override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
                               timerValues: TimerValues): Iterator[(Int, Int)] = {
    val n = (if (count.exists()) count.get() else 0) + rows.size
    count.update(n)
    Iterator.single((key, n))
  }
}

abstract class TransformWithStateSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-tws-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: transformWithState with ValueState + ListState across batches") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Int, String)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new CountAndRecentProcessor,
        TimeMode.None(), OutputMode.Update())

    val query = out.toDF("id", "n", "items").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(s"tws_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-tws-$suiteName").toString)
      .start()

    input.addData((1, "a"), (1, "b"), (2, "x"))
    query.processAllAvailable()
    input.addData((1, "c"), (2, "y"))
    query.processAllAvailable()

    val latest = spark.sql(
      s"select id, max(n), max(items) from tws_$suiteName group by id")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(latest(1)._1 === 3)
    assert(latest(1)._2 === "a,b,c")
    assert(latest(2)._1 === 2)
    assert(latest(2)._2 === "x,y")
    query.stop()
  }

  test(s"$suiteName: transformWithState MapState (prefix-scanned composite keys)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Int, String)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new PerCategoryCounter,
        TimeMode.None(), OutputMode.Update())

    val query = out.toDF("id", "cat", "n").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(s"twsmap_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-twsmap-$suiteName").toString)
      .start()

    input.addData((1, "a"), (1, "a"), (1, "b"), (2, "a"))
    query.processAllAvailable()
    input.addData((1, "a"), (2, "c"))
    query.processAllAvailable()

    val latest = spark.sql(
      s"select id, cat, max(n) from twsmap_$suiteName group by id, cat")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(latest === Map((1, "a") -> 3L, (1, "b") -> 1L, (2, "a") -> 1L, (2, "c") -> 1L))
    query.stop()
  }

  test(s"$suiteName: transformWithState seeds state from an initial Dataset") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val initial = Seq((1, 100), (3, 7)).toDS()
      .groupByKey(_._1).mapValues(_._2)
    val input = MemoryStream[(Int, String)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new CountWithInitProcessor,
        TimeMode.None(), OutputMode.Update(), initial)

    val query = out.toDF("id", "n").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(s"twsinit_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-twsinit-$suiteName").toString)
      .start()

    input.addData((1, "a"), (2, "x"))
    query.processAllAvailable()
    input.addData((3, "z"), (1, "b"))
    query.processAllAvailable()

    val latest = spark.sql(
      s"select id, max(n) from twsinit_$suiteName group by id")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // key 1: seeded 100 + 2 events; key 2: unseeded; key 3: seeded 7 + 1
    assert(latest === Map(1 -> 102, 2 -> 1, 3 -> 8))
    query.stop()
  }

  test(s"$suiteName: transformWithState native TTLConfig expires ValueState") {
    // TimeMode.ProcessingTime queries never quiesce: shouldRunAnotherBatch
    // is unconditionally true in that mode, so even a Trigger.AvailableNow
    // run keeps scheduling no-data batches and never self-terminates —
    // awaitTermination would burn its full timeout and leave a zombie
    // query racing the next restart on the same checkpoint. Instead: poll
    // the collected output for the expected rows (plus a short grace so a
    // spurious extra emission would still surface), then stop() — which
    // still exercises restart recovery across the two runs.
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Int, String)]
    val ckpt = Files.createTempDirectory(s"graft-twsttl-$suiteName").toString
    // memory sink can't recover a checkpoint; foreachBatch can
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Int)]())

    def runOnce(expectRows: Int): List[Int] = {
      collected.clear()
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new TtlCountProcessor(ttlMs = 500),
          TimeMode.ProcessingTime(), OutputMode.Update())
      val query = out.writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Int, Int)], _: Long) =>
          batch.collect().foreach(collected.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val deadline = System.currentTimeMillis + 60000
      while (collected.size < expectRows && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      Thread.sleep(500) // grace: an unexpected extra row must still be seen
      query.stop()
      import scala.jdk.CollectionConverters._
      collected.asScala.toList.filter(_._1 == 1).map(_._2).sorted
    }

    input.addData((1, "a"), (1, "b"))
    assert(runOnce(expectRows = 1) === List(2))
    Thread.sleep(2000) // well past the 500ms TTL
    input.addData((1, "c"))
    // state expired between runs → count restarts at 1, not 3
    assert(runOnce(expectRows = 1) === List(1))
  }
  test(s"$suiteName: processing-time timers fire, re-arm, and cancel") {
    // AvailableNow keeps scheduling no-data batches while timers are
    // pending, so each run observes its timers through to firing.
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Int, String)]
    val ckpt = Files.createTempDirectory(s"graft-twstimer-$suiteName").toString
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, String, Int)]())

    // ProcessingTime mode never self-terminates (shouldRunAnotherBatch is
    // unconditionally true), so poll for the expected output rows plus a
    // grace window, then stop() — see the TTLConfig test above.
    def runOnce(expectRows: Int, graceMs: Long): List[(Int, String, Int)] = {
      collected.clear()
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new SessionFlushProcessor,
          TimeMode.ProcessingTime(), OutputMode.Update())
      val query = out.writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Int, String, Int)], _: Long) =>
          batch.collect().foreach(collected.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val deadline = System.currentTimeMillis + 60000
      while (collected.size < expectRows && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      Thread.sleep(graceMs)
      query.stop()
      import scala.jdk.CollectionConverters._
      collected.asScala.toList
    }

    // key 1: two arrivals re-arm one 2s timer → exactly one flush with the
    // session total. key 2: arms a 60s timer then cancels it — no flush for
    // key 2 inside the grace window is the observable proof of deleteTimer
    // (an uncancelled timer would be 60s out either way; the sharp check is
    // the "cancelled" row and the exactly-once flush of the re-armed key).
    input.addData((1, "2000"), (2, "60000"))
    input.addData((1, "2000"), (2, "cancel"))
    // 4 "open"/"cancelled" rows from the two data batches + 1 flush at ~2s
    val r1 = runOnce(expectRows = 5, graceMs = 1500)
    assert(r1.contains((1, "flushed", 2)))
    assert(r1.count(t => t._1 == 1 && t._2 == "flushed") === 1,
      "re-armed timer must fire exactly once")
    assert(r1.contains((2, "cancelled", 0)))
    assert(!r1.exists(t => t._1 == 2 && t._2 == "flushed"))

    // flush cleared the state: key 1's next session restarts at 1
    input.addData((1, "500"))
    val r2 = runOnce(expectRows = 2, graceMs = 500)
    assert(r2.contains((1, "open", 1)))
    assert(r2.contains((1, "flushed", 1)))
  }

  test(s"$suiteName: event-time timers fire on watermark progress, not wall clock") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(Int, java.sql.Timestamp)]
    val ckpt = Files.createTempDirectory(s"graft-twsevt-$suiteName").toString
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, String, Int)]())

    def runOnce(): List[(Int, String, Int)] = {
      collected.clear()
      val out = input.toDS().toDF("id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Int, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new EventTimeFlushProcessor,
          TimeMode.EventTime(), OutputMode.Update())
      val query = out.writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Int, String, Int)], _: Long) =>
          batch.collect().foreach(collected.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination(120000)
      query.stop()
      import scala.jdk.CollectionConverters._
      collected.asScala.toList
    }

    // key 1's session ends at event-time 10s → timer armed for 11s. The
    // watermark is still ≤10s when the run ends, so NO flush yet no matter
    // how much wall time passes.
    input.addData((1, ts(9)), (1, ts(10)))
    val r1 = runOnce()
    assert(r1.contains((1, "open", 2)))
    assert(!r1.exists(_._2 == "flushed"))

    Thread.sleep(1500) // wall time must NOT fire an event-time timer
    // 10.5s is past the 10s watermark (not late) but re-arms the timer to
    // 11.5s — still ahead of the watermark, so again no flush
    input.addData((1, new java.sql.Timestamp(10500L)))
    val r2 = runOnce()
    assert(r2.contains((1, "open", 3)))
    assert(!r2.exists(_._2 == "flushed"),
      "timer fired on wall clock / non-advancing watermark")

    // key 99's event at 30s pushes the watermark past 11.5s → key 1
    // flushes with its session total of 3
    input.addData((99, ts(30)))
    val r3 = runOnce()
    assert(r3.contains((1, "flushed", 3)))
  }
}

class InMemoryTransformWithStateSuite extends TransformWithStateSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName = "inmemory"
}

class RocksDbTransformWithStateSuite extends TransformWithStateSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName = "rocksdb"
}
