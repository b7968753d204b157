package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming funnel: per-entity step state persists across micro-batches
  * through our providers; advances equal the batch funnel under in-order
  * delivery; stale ordinals never advance a funnel.
  */
abstract class StreamingFunnelSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def backendName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-funnel-$backendName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$backendName: advances across batches match the batch funnel; stale ords ignored") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, String)]
    val advances = StreamingFunnel.funnelStream(
      input.toDS().toDF("user_id", "event_id", "event_type"),
      Seq("view", "click", "purchase"))

    val query = advances.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sfunnel_$backendName")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sfunnel").toString)
      .start()

    // batch 1: u1's click(0) precedes its view(1) — strictness holds even
    // when both arrive unsorted inside one batch; u2 reaches step 0
    input.addData((1L, 3L, "click"), (1L, 0L, "click"), (1L, 1L, "view"),
      (2L, 1L, "view"))
    query.processAllAvailable()
    val t = () => spark.table(s"sfunnel_$backendName").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(t() == Set((1L, 0, 1L), (1L, 1, 3L), (2L, 0, 1L)), s"batch 1: ${t()}")

    // batch 2: u1 completes (state remembered click@3 through the SPI);
    // u2's stale click(0) — ord below its view(1) — must NOT advance
    input.addData((1L, 5L, "purchase"), (2L, 0L, "click"))
    query.processAllAvailable()
    assert(t() == Set((1L, 0, 1L), (1L, 1, 3L), (2L, 0, 1L), (1L, 2, 5L)),
      s"batch 2: ${t()}")
    query.stop()

    // parity: the batch operator over the union of both batches reaches
    // the same steps (all deliveries here were per-entity in order)
    val all = Seq((1L, 3L, "click"), (1L, 0L, "click"), (1L, 1L, "view"),
      (2L, 1L, "view"), (1L, 5L, "purchase"), (2L, 0L, "click"))
      .toDF("user_id", "event_id", "event_type")
    val batch = graft.operators.Sessionize.funnel(all, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.get(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(batch == Map(
      1L -> ((1L, Some(3L), Some(5L))),
      2L -> ((1L, None, None))))
  }
}

class StreamingFunnelRocksDbSuite extends StreamingFunnelSuiteBase {
  def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  def backendName: String = "rocksdb"
}

class StreamingFunnelInMemorySuite extends StreamingFunnelSuiteBase {
  def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  def backendName: String = "inmemory"
}
