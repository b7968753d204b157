package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The full §2.B streaming-operator surface (SURVEY.md) running on our
  * providers: stream-stream join, flatMapGroupsWithState, session windows,
  * streaming global limit, dropDuplicatesWithinWatermark. Each operator
  * routes all its keyed state through the provider under test — these are
  * the capability checks that the SPI implementation is actually complete
  * (column families, multiple stores per operator, watermark-driven
  * eviction).
  */
object StreamingOpsFns extends Serializable {
  def explodeCounts(id: Int, rows: Iterator[(Int, String)],
                    state: GroupState[Int]): Iterator[(Int, Int)] = {
    val total = state.getOption.getOrElse(0) + rows.size
    state.update(total)
    Iterator.single((id, total))
  }
}

abstract class StreamingOpsSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient protected var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-ops-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ckpt(tag: String): String =
    Files.createTempDirectory(s"graft-ops-$suiteName-$tag").toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test(s"$suiteName: stream-stream inner join with watermarks") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(java.sql.Timestamp, Int, String)]
    val imps = MemoryStream[(java.sql.Timestamp, Int, String)]

    val clickDf = clicks.toDF().toDF("click_ts", "ad", "click_info")
      .withWatermark("click_ts", "10 seconds")
    val impDf = imps.toDF().toDF("imp_ts", "ad", "imp_info")
      .withWatermark("imp_ts", "10 seconds")

    val query = impDf.as("i").join(clickDf.as("c"),
        expr("i.ad = c.ad AND c.click_ts >= i.imp_ts AND c.click_ts <= i.imp_ts + interval 30 seconds"))
      .select($"i.ad", $"i.imp_info", $"c.click_info")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"ssjoin_$suiteName")
      .option("checkpointLocation", ckpt("ssjoin"))
      .start()

    imps.addData((ts("2024-01-01 00:00:00"), 1, "imp1"), (ts("2024-01-01 00:00:05"), 2, "imp2"))
    query.processAllAvailable()
    clicks.addData((ts("2024-01-01 00:00:10"), 1, "click1"),
                   (ts("2024-01-01 00:02:00"), 2, "late-click"))
    query.processAllAvailable()

    val rows = spark.sql(s"select ad, imp_info, click_info from ssjoin_$suiteName")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    // ad 1 joins within 30s; ad 2's click is outside the interval
    assert(rows === Set((1, "imp1", "click1")))
    query.stop()
  }

  test(s"$suiteName: flatMapGroupsWithState emits per-group updates") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Int, String)]
    val counts = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        StreamingOpsFns.explodeCounts)

    val query = counts.toDF("id", "n").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(s"fmgws_$suiteName")
      .option("checkpointLocation", ckpt("fmgws"))
      .start()

    input.addData((1, "a"), (1, "b"), (2, "c"))
    query.processAllAvailable()
    input.addData((1, "d"), (3, "e"))
    query.processAllAvailable()

    val byId = spark.sql(s"select id, max(n) from fmgws_$suiteName group by id")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(byId === Map(1 -> 3, 2 -> 1, 3 -> 1))
    query.stop()
  }

  test(s"$suiteName: session window aggregation") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window($"ts", "30 seconds"), $"user")
      .agg(count(lit(1)).as("n_events"))

    val query = sessions
      .select($"user", $"n_events",
        $"session_window.start".cast("long").as("start_s"),
        $"session_window.end".cast("long").as("end_s"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(s"sess_$suiteName")
      .option("checkpointLocation", ckpt("sess"))
      .start()

    // two bursts for u1 separated by > 30s gap → two sessions
    input.addData((ts("2024-01-01 00:00:00"), "u1"), (ts("2024-01-01 00:00:10"), "u1"),
                  (ts("2024-01-01 00:00:05"), "u2"))
    query.processAllAvailable()
    input.addData((ts("2024-01-01 00:05:00"), "u1"))
    query.processAllAvailable()

    val rows = spark.sql(s"select user, n_events from sess_$suiteName order by user, n_events")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(rows === List(("u1", 1L), ("u1", 2L), ("u2", 1L)))
    query.stop()
  }

  test(s"$suiteName: streaming global limit keeps state across batches") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Int]
    val query = input.toDF().limit(4)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"lim_$suiteName")
      .option("checkpointLocation", ckpt("lim"))
      .start()

    input.addData(1, 2, 3)
    query.processAllAvailable()
    input.addData(4, 5, 6) // only one more should pass the global limit
    query.processAllAvailable()

    val n = spark.sql(s"select count(*) from lim_$suiteName").collect().head.getLong(0)
    assert(n === 4L)
    query.stop()
  }

  test(s"$suiteName: dropDuplicatesWithinWatermark evicts expired dedup state") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "5 seconds")
      .dropDuplicatesWithinWatermark("event_id")

    val query = deduped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"ddww_$suiteName")
      .option("checkpointLocation", ckpt("ddww"))
      .start()

    input.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:01"), 1L))
    query.processAllAvailable()
    // advance watermark far past the dedup window, then repeat id 1
    input.addData((ts("2024-01-01 00:10:00"), 2L))
    query.processAllAvailable()
    input.addData((ts("2024-01-01 00:10:01"), 1L))
    query.processAllAvailable()

    val n = spark.sql(s"select count(*) from ddww_$suiteName").collect().head.getLong(0)
    // id1 (first), id2, id1-again (state evicted by watermark) = 3
    assert(n === 3L)
    query.stop()
  }

  test(s"$suiteName: file source feeds stateful aggregation across arrivals") {
    // the production shape for batch-ish ingestion at scale: files land in
    // a directory, the stream discovers them per trigger, and the running
    // aggregate's state lives in our provider between triggers
    val sql = spark
    import sql.implicits._
    val inDir = Files.createTempDirectory(s"graft-filesrc-$suiteName").toString

    Seq((1, 10L), (2, 20L)).toDF("uid", "amount")
      .write.mode("append").parquet(inDir)

    val stream = spark.readStream
      .schema("uid INT, amount BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .groupBy($"uid").agg(sum($"amount").as("total"))

    val query = stream.writeStream
      .format("memory")
      .queryName(s"filesrc_$suiteName")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt("filesrc"))
      .start()
    query.processAllAvailable()

    // second wave of files: uid 1 again — the provider must resurface the
    // committed running total, not start from zero
    Seq((1, 5L), (3, 30L)).toDF("uid", "amount")
      .write.mode("append").parquet(inDir)
    query.processAllAvailable()

    val totals = spark.sql(s"select uid, total from filesrc_$suiteName")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(totals === Map(1 -> 15L, 2 -> 20L, 3 -> 30L))
    query.stop()
  }

  test(s"$suiteName: foreachBatch upserts running aggregates idempotently") {
    // the production sink shape for "stream into a table": per-batch
    // upsert keyed by (uid), written with the batchId so a replayed batch
    // overwrites rather than double-applies — exactly-once semantics on
    // top of the provider's at-least-once batch replay
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val target = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    def upsert(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
               batchId: Long): Unit =
      batch.collect().foreach { r =>
        val k = r.getInt(0)
        val v = r.getLong(1)
        // idempotent: a replay of batchId b must not regress a newer write
        target.compute(k, (_, old) =>
          if (old == null || old._2 <= batchId) (v, batchId) else old)
      }

    val input = MemoryStream[(Int, Long)]
    val query = input.toDF().toDF("uid", "amount")
      .groupBy($"uid").agg(sum($"amount").as("total"))
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt("feb"))
      .foreachBatch(upsert _)
      .start()
    input.addData((1, 10L), (2, 20L))
    query.processAllAvailable()
    input.addData((1, 5L))
    query.processAllAvailable()
    query.stop()

    assert(target.get(1)._1 === 15L) // state carried across batches
    assert(target.get(2)._1 === 20L)
    // simulate the at-least-once replay of batch 0: the stale total must
    // not clobber the newer one
    upsert(Seq((1, 10L)).toDF("uid", "total"), 0L)
    assert(target.get(1)._1 === 15L)
  }

  test(s"$suiteName: two stateful operators chained in one query (dedup → windowed agg)") {
    // one streaming query, TWO stateful operators with distinct
    // operatorIds — dedup state and aggregation state live in separate
    // store instances of the provider under test, within one checkpoint
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Int, Int)]
    val query = input.toDF().toDF("ts", "event_id", "user")
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("event_id")
      .groupBy(window($"ts", "1 minute"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"user", $"n")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(s"chained_$suiteName")
      .option("checkpointLocation", ckpt("chained"))
      .start()

    input.addData(
      (ts("2024-01-01 00:00:01"), 1, 7),
      (ts("2024-01-01 00:00:02"), 2, 7),
      (ts("2024-01-01 00:00:01"), 1, 7)) // in-batch duplicate
    query.processAllAvailable()
    input.addData(
      (ts("2024-01-01 00:00:03"), 2, 7), // cross-batch duplicate
      (ts("2024-01-01 00:00:10"), 3, 8)) // new user
    query.processAllAvailable()
    query.stop()

    // latest update per user: dup events never re-counted
    val rows = spark.table(s"chained_$suiteName")
      .groupBy($"user").agg(max($"n").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows === Map(7 -> 2L, 8 -> 1L))
  }

  test(s"$suiteName: parquet file sink appends exactly-once across a restart") {
    // stateful dedup (state on our provider) → parquet sink. The file
    // sink's transaction log + the recovered dedup state must together
    // give exactly-once file output even when the query restarts and old
    // duplicates arrive again.
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val outDir = Files.createTempDirectory(s"graft-fsink-$suiteName-out").toString
    val ckptDir = ckpt("fsink")
    val input = MemoryStream[(Int, String)]

    def startQuery() = input.toDF().toDF("id", "payload")
      .dropDuplicates("id")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .start()

    val q1 = startQuery()
    input.addData((1, "a"), (2, "b"), (1, "dup-in-batch"))
    q1.processAllAvailable()
    input.addData((2, "dup-across-batch"), (3, "c"))
    q1.processAllAvailable()
    q1.stop()

    val firstRun = spark.read.parquet(outDir)
    assert(firstRun.count() === 3) // 1, 2, 3 — each exactly once

    // restart over the same checkpoint: dedup state recovers from the
    // provider, so replayed ids write nothing; only id 4 is new
    val q2 = startQuery()
    input.addData((1, "replay"), (3, "replay"), (4, "d"))
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === 4)
    assert(out.select("id").as[Int].collect().sorted === Array(1, 2, 3, 4))
    // the payload kept for each id is the FIRST seen (dedup, not upsert)
    val kept = out.as[(Int, String)].collect().toMap
    assert(kept(1) === "a" && kept(2) === "b")
  }
}

class InMemoryStreamingOpsSuite extends StreamingOpsSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName = "inmemory"
}

class RocksDbStreamingOpsSuite extends StreamingOpsSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName = "rocksdb"
}
