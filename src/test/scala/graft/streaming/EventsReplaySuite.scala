package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.state.implicits._

/** FIXTURES.md §4: replay the driver-generated `events` table as a stream
  * (file source over its parquet) and drive the production-shaped
  * pipelines against our providers, cross-checking every streaming result
  * against the equivalent batch computation on the same data — stream and
  * batch must agree exactly.
  */
class EventsReplaySuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  @transient private var spark: SparkSession = _
  private var streamDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-events-replay")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .useRocksDbStateStore()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // file stream sources read directories; re-stage the single-file table
    // as 4 files so maxFilesPerTrigger=1 produces 4 genuine micro-batches
    streamDir = Files.createTempDirectory("graft-events-stream").toString
    // stage through Tables.events so `ts` is a nanos-long whatever the
    // generator's current physical type (NANOS-as-long vs MICROS/NTZ)
    graft.Tables.events(spark, sfDir)
      .repartition(4).write.mode("overwrite").parquet(streamDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The events stream: ts arrives as nanos-long; derive a proper event
    * timestamp for watermarking. maxFilesPerTrigger forces multiple
    * micro-batches so state actually carries across batches.
    */
  private def eventsStream(): DataFrame = {
    val schema = spark.read.parquet(streamDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
      .withColumn("ets", timestamp_micros(((col("ts") / 1000L)).cast("long")))
  }

  private def runToCompletion(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory(s"graft-er-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("windowed aggregation over replayed events matches batch") {
    val agg = eventsStream()
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("ws"), col("event_type"), col("n"), col("sum_value"))
    runToCompletion(agg, "er_winagg", OutputMode.Complete())

    val streamed = spark.sql("select * from er_winagg")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    val batch = graft.Tables.events(spark, sfDir)
      .withColumn("ets", timestamp_micros(((col("ts") / 1000L)).cast("long")))
      .groupBy(window(col("ets"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    assert(streamed === batch)
  }

  test("streaming dedup on event_id over replayed events matches batch distinct") {
    val deduped = eventsStream()
      .select(col("event_id"), col("user_id"))
      .dropDuplicates("event_id")
    runToCompletion(deduped, "er_dedup", OutputMode.Append())

    val streamedCount = spark.sql("select count(distinct event_id) from er_dedup")
      .collect().head.getLong(0)
    val batchCount = graft.Tables.events(spark, sfDir)
      .select(countDistinct(col("event_id"))).collect().head.getLong(0)
    assert(streamedCount === batchCount)
  }

  test("per-user running totals via mapGroupsWithState match batch aggregation") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    val perUser = eventsStream()
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], st: GroupState[(Long, Double)]) =>
          val (n0, s0) = st.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          st.update((n, s))
          (uid, n)
      }
    runToCompletion(perUser.toDF("user_id", "n"), "er_mgws", OutputMode.Update())

    val streamed = spark.sql("select user_id, max(n) as n from er_mgws group by user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("stream-batch join: replayed events enriched with a dimension table") {
    // streaming fact joined to a static dim — the standard enrichment shape
    val dim = spark.createDataFrame(Seq(
      ("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")))
      .toDF("event_type", "category")
    val enriched = eventsStream()
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"))
    runToCompletion(enriched, "er_enrich", OutputMode.Complete())

    val streamed = spark.sql("select category, n from er_enrich")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.Tables.events(spark, sfDir)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming curation (quality gate + exact dedup) matches the batch pipeline") {
    // the training-data curation flow in its streaming form: documents
    // arrive continuously, the quality gate runs map-side, exact dedup is
    // stateful dropDuplicates on the content digest through our provider
    import graft.operators.TextOps
    val docsDir = Files.createTempDirectory("graft-docs-stream").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(4).write.mode("overwrite").parquet(docsDir)
    val schema = spark.read.parquet(docsDir).schema

    val curated = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("ttr", TextOps.typeTokenRatio(col("text")))
      .filter(col("n_tokens").between(10, 100) && col("ttr") > 0.3)
      .withColumn("digest", xxhash64(col("text")))
      .dropDuplicates("digest")
      .select(col("source"), col("n_tokens"))
    runToCompletion(curated, "er_curate", OutputMode.Append())

    val streamed = spark.sql(
      "select source, count(*) as n, sum(n_tokens) as toks from er_curate group by source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // batch equivalent: same gate, keep ONE doc per distinct text
    val batch = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("ttr", TextOps.typeTokenRatio(col("text")))
      .filter(col("n_tokens").between(10, 100) && col("ttr") > 0.3)
      .dropDuplicates("text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("toks"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // counts per source match exactly; token sums match because duplicate
    // texts have identical token counts regardless of which copy survives
    assert(streamed === batch)
  }
}
