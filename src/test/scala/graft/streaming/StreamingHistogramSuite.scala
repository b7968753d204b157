package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming length-quantile sketches: per-source bucket counts live in
  * our state providers and merge by count addition across batches; after
  * a full replay the latest row per source equals the batch
  * [[graft.operators.HistogramSketch.sourceLengthQuantiles]] exactly
  * (same bucket column, same integer CDF walk — one definition each).
  */
abstract class StreamingHistogramSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-hist-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: replay's latest rows ≡ batch sourceLengthQuantiles") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 3 sources, long-tailed lengths spanning several bucket shifts,
    // plus a null text that must contribute nothing
    val rnd = new scala.util.Random(3)
    val docs = (1 to 90).map { i =>
      val len = 1 + math.pow(2.0, rnd.nextDouble() * 10).toInt
      (s"s${i % 3}", Seq.fill(len)("w").mkString(" "))
    } ++ Seq(("s0", null.asInstanceOf[String]))

    val input = MemoryStream[(String, String)]
    val rows = StreamingHistogram.sourceLengthQuantilesStream(
      input.toDS().toDF("source", "text"))
    val query = rows.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"shq_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-shq-$suiteName").toString)
      .start()
    docs.grouped(13).foreach { g => input.addData(g.toSeq: _*); query.processAllAvailable() }

    // n_docs grows strictly per emitted row for a source, so the latest
    // row is the max-n_docs one — no reliance on sink row order
    val latest = spark.table(s"shq_$suiteName").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
    query.stop()

    val batch = graft.operators.HistogramSketch.sourceLengthQuantiles(
        docs.toDF("source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(batch.nonEmpty && batch.exists(_._3 > 5),
      s"degenerate fixture: too few buckets in $batch")
    assert(latest === batch, s"stream latest $latest must equal batch $batch")
  }
}

class StreamingHistogramRocksDbSuite extends StreamingHistogramSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingHistogramInMemorySuite extends StreamingHistogramSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
