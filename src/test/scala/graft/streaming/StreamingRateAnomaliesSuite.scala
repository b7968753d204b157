package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.state.RocksDbStateStoreProvider

/** Rate anomalies on a STREAM by composition — no new kernel: a
  * watermarked hourly window count (Spark's streaming agg on our
  * provider) feeds [[graft.operators.Sessionize.flagOutliers]] with a
  * model fitted on the reference window's bucket counts
  * ([[graft.operators.Sessionize.fitOutlierModel]] over `cnt` — the
  * k-sigma inequality is scale-invariant, so the µ-scaled fit flags
  * exactly the batch [[graft.operators.Sessionize.rateAnomalies]] set).
  * The serve side is a pure projection, so the flags surface as each
  * window finalizes.
  */
class StreamingRateAnomaliesSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-stream-rate-anomalies")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("windowed counts + fitted model ≡ batch rateAnomalies") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val H = 3600L * 1000000000L
    // steady type: 12 hours x 10 events; spiky type: 11 x 10 + one
    // 150-event storm hour
    val events = (for (h <- 0 until 12; i <- 0 until 10)
        yield (h.toLong * 1000 + i, h * H + i * 1000L, "steady")) ++
      (for (h <- 0 until 11; i <- 0 until 10)
        yield (100000L + h * 1000 + i, h * H + i * 1000L, "spiky")) ++
      (0 until 150).map(i => (200000L + i, 11 * H + i * 1000L, "spiky"))
    val eventsDf = events.toDF("event_id", "ts", "event_type")

    // batch truth + the fitted model over the same reference window
    val batchFlags = Sessionize.rateAnomalies(eventsDf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batchFlags === Set(("spiky", 11L)), s"fixture: $batchFlags")
    val rates = eventsDf
      .select(col("event_type"), expr(s"ts div ${H}L").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val model = Sessionize.fitOutlierModel(rates, k = 3, valueCol = "cnt")

    // stream: watermarked hourly tumbling window count, flags served by
    // the SAME pure-projection flagOutliers on the finalized windows
    val input = MemoryStream[(Long, Long, String)]
    val counts = input.toDS().toDF("event_id", "ts", "event_type")
      .withColumn("tts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("tts", "10 minutes")
      .groupBy(window(col("tts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        expr(s"(unix_micros(window.start) * 1000) div ${H}L").as("bucket"),
        col("event_type"), col("cnt"))
    val flagged = Sessionize.flagOutliers(counts, model,
      valueCol = "cnt", idCol = "bucket")
    val query = flagged.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("srate")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-srate").toString)
      .start()

    input.addData(events: _*)
    query.processAllAvailable()
    // push the watermark past every fixture window so they all finalize
    input.addData((999999L, 20 * H, "steady"))
    query.processAllAvailable()
    val streamFlags = spark.table("srate").collect()
      .map(r => (r.getString(1), r.getLong(0))).toSet
    query.stop()

    assert(streamFlags === batchFlags,
      s"stream flags $streamFlags must equal batch $batchFlags")
  }
}
