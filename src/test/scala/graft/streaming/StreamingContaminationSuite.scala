package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TextOps
import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** The q167 contamination matrix's streaming twin: a full replay of the
  * corpus through [[StreamingCuration.contaminationMatrixStream]] must
  * reproduce the batch [[TextOps.contaminationMatrix]]'s per-(source,
  * eval) counts exactly — same tagged-union broadcast (one shared
  * builder), per-(doc, eval) exactly-once from dedup state, counts from
  * aggregation state — including across batch boundaries and under
  * re-delivery. ×2 SPI backends.
  */
abstract class StreamingContaminationSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-contam-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // two benchmarks with overlapping gram sets; docs across two sources.
  // doc 2 leaks BOTH benchmarks (must count once per (doc, eval)); doc 5
  // leaks bench_a through TWO distinct 4-grams (must still count once);
  // docs 1/4 are clean.
  private val evalA = Seq((900L, "q1 q2 q3 q4 q5 tail")) // grams q1..q4, q2..q5
  private val evalB = Seq((901L, "r1 r2 r3 r4 filler"), (902L, "q2 q3 q4 q5 x"))
  private val corpus = Seq(
    (1L, "web", "clean words only in here nothing shared"),
    (2L, "web", "x q2 q3 q4 q5 y"),          // hits evalA AND evalB
    (3L, "book", "pre r1 r2 r3 r4 post"),     // hits evalB only
    (4L, "book", "another clean document entirely"),
    (5L, "web", "z q1 q2 q3 q4 q5 w"))        // two evalA grams, one doc

  private def evalsDf = {
    val sql = spark
    import sql.implicits._
    Seq("bench_a" -> evalA.toDF("doc_id", "text"),
      "bench_b" -> evalB.toDF("doc_id", "text"))
  }

  test(s"$suiteName: replayed stream matrix ≡ batch matrix counts, exactly-once under re-delivery") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = TextOps.contaminationMatrix(
        corpus.toDF("doc_id", "source", "text"), evalsDf)
      .select($"source", $"eval_name", $"n_contaminated")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val input = MemoryStream[(Long, String, String)]
    val matrix = StreamingCuration.contaminationMatrixStream(
      input.toDS().toDF("doc_id", "source", "text"), evalsDf)
    val query = matrix.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(s"scontam_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scontam-$suiteName").toString)
      .start()

    // three batches, with doc 2 RE-DELIVERED in batch 3 — the dedup
    // state must keep its (doc, eval) contributions exactly-once
    input.addData(corpus.take(2): _*)
    query.processAllAvailable()
    input.addData(corpus.slice(2, 4): _*)
    query.processAllAvailable()
    input.addData(corpus(4), corpus(1))
    query.processAllAvailable()

    val streamed = spark.table(s"scontam_$suiteName")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    query.stop()

    // the fixture must be non-vacuous in every dimension it claims
    assert(batch === Map(
      ("web", "bench_a") -> 2L,   // docs 2 and 5 (5 via two grams: once)
      ("web", "bench_b") -> 2L,   // docs 2 and 5 (both carry q2..q5, 902's gram)
      ("book", "bench_b") -> 1L), // doc 3
      s"batch fixture drifted: $batch")
    assert(streamed === batch,
      s"stream matrix diverged:\nbatch  $batch\nstream $streamed")
  }

  test(s"$suiteName: counts accumulate across batches (mid-replay state is a prefix matrix)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, String)]
    val matrix = StreamingCuration.contaminationMatrixStream(
      input.toDS().toDF("doc_id", "source", "text"), evalsDf)
    val query = matrix.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(s"scontamp_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scontamp-$suiteName").toString)
      .start()

    input.addData(corpus.take(3): _*)
    query.processAllAvailable()
    val mid = spark.table(s"scontamp_$suiteName")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // after docs 1-3: doc 2 hit both benches, doc 3 hit bench_b
    assert(mid === Map(
      ("web", "bench_a") -> 1L, ("web", "bench_b") -> 1L,
      ("book", "bench_b") -> 1L), s"prefix matrix: $mid")

    input.addData(corpus.drop(3): _*)
    query.processAllAvailable()
    val full = spark.table(s"scontamp_$suiteName")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    query.stop()
    assert(full(("web", "bench_a")) === 2L, s"doc 5 must raise the web/bench_a count: $full")
  }
}

class StreamingContaminationRocksDbSuite extends StreamingContaminationSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingContaminationInMemorySuite extends StreamingContaminationSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
