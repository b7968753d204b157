package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming inter-event-gap quantiles: per-user latest-event state feeds
  * per-type bucket tables in our state providers (two chained stateful
  * operators); after a ts-ordered replay the latest row per event type
  * equals the batch
  * [[graft.operators.HistogramSketch.eventGapQuantiles]] exactly — gap
  * extraction shares the (ts, id) tie rule, bucketing the property-pinned
  * mirror, and histogram insertion is order-independent count addition.
  */
abstract class StreamingEventGapsSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-gaps-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: ts-ordered replay's latest rows ≡ batch eventGapQuantiles") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 4 users, 3 event types, long-tailed gaps spanning bucket shifts;
    // all ts distinct so cross-batch order is unambiguous
    val rnd = new scala.util.Random(13)
    var t = 1000L
    val events = (1 to 160).map { i =>
      t += 1 + math.pow(2.0, rnd.nextDouble() * 12).toLong
      (i.toLong % 4, t, i.toLong, s"e${i % 3}")
    }

    val input = MemoryStream[(Long, Long, Long, String)]
    val rows = StreamingEventGaps.eventGapQuantilesStream(
      input.toDS().toDF("user_id", "ts", "event_id", "event_type"))
    val query = rows.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"segq_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-segq-$suiteName").toString)
      .start()
    events.sortBy(_._2).grouped(37).foreach { g =>
      input.addData(g.toSeq: _*); query.processAllAvailable()
    }
    val latest = spark.table(s"segq_$suiteName").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
    query.stop()

    val batch = graft.operators.HistogramSketch.eventGapQuantiles(
        events.toDF("user_id", "ts", "event_id", "event_type"))
      .select(col("event_type"), col("n_gaps"), col("n_buckets"),
        col("p50"), col("p90"), col("p99"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(batch.nonEmpty && batch.exists(_._3 > 4),
      s"degenerate fixture: too few buckets in $batch")
    assert(latest === batch, s"stream latest $latest must equal batch $batch")
  }
}

/** The fail-safe disorder contract: a late (out-of-(ts,id)-order) event
  * must be DROPPED — emitting its negative gap as bucket 0 would
  * silently drag every quantile toward 0 with no retraction possible. */
class StreamingEventGapsDisorderSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-stream-gaps-disorder")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[InMemoryStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a late cross-batch event is dropped, not folded as a phantom 0 gap") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, Long, String)]
    val rows = StreamingEventGaps.eventGapQuantilesStream(
      input.toDS().toDF("user_id", "ts", "event_id", "event_type"))
    val query = rows.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("segq_disorder")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-segq-disorder").toString)
      .start()

    // batch 1: user 1 at ts 100 and 1100 → one gap of 1000
    input.addData((1L, 100L, 1L, "a"), (1L, 1100L, 2L, "a"))
    query.processAllAvailable()
    // batch 2: a LATE event at ts 50 — must contribute nothing and must
    // not regress the stored (ts, id)
    input.addData((1L, 50L, 3L, "a"))
    query.processAllAvailable()
    // batch 3: an in-order event at ts 2100 → gap 1000 from ts 1100
    // (NOT 2050 from the late event — state never regressed)
    input.addData((1L, 2100L, 4L, "a"))
    query.processAllAvailable()

    val latest = spark.table("segq_disorder").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .maxBy(_._2)
    query.stop()
    // two gaps, both exactly 1000 → one bucket at rep(1000) = 992, p50 = 992
    assert(latest === (("a", 2L, 1L, 992L)),
      s"late event leaked into the histogram: $latest")
  }
}

class StreamingEventGapsRocksDbSuite extends StreamingEventGapsSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingEventGapsInMemorySuite extends StreamingEventGapsSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
