package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming KMV sketches: the per-source sketch lives in our state
  * providers and grows across batches; the latest emitted row per
  * source after a full replay equals the batch
  * [[graft.operators.Dedup.sourceSketches]] exactly (same hash, same
  * insert algebra, same integer estimator — one definition each), and
  * duplicates never grow the sketch.
  */
abstract class StreamingSketchSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-sketch-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: replay's latest rows ≡ batch sourceSketches; dups don't grow it") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 3 sources, enough distinct docs to FILL k=8 sketches, plus exact
    // duplicates and a null text sprinkled in
    val docs = (1L to 60L).map { i =>
      (s"s${i % 3}", if (i % 10 == 0) "dup payload" else s"doc $i body ${i * 13}")
    } ++ Seq(("s0", null.asInstanceOf[String]))

    val input = MemoryStream[(String, String)]
    val rows = StreamingSketch.sourceSketchesStream(
      input.toDS().toDF("source", "text"), k = 8)
    val query = rows.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"ssk_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ssk-$suiteName").toString)
      .start()
    docs.grouped(9).foreach { g => input.addData(g.toSeq: _*); query.processAllAvailable() }

    // consumers keep the LATEST row per source. A sketch only improves
    // monotonically: n_kmv grows until k, then positions only decrease —
    // so the latest row is max n_kmv, then the value-wise (lexicographic)
    // MINIMUM among full sketches, without relying on sink row order.
    val frame = spark.table(s"ssk_$suiteName").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    implicit val seqOrd: Ordering[Seq[Long]] =
      Ordering.Implicits.seqOrdering[Seq, Long]
    val latest = frame.groupBy(_._1).map { case (_, rs) =>
      val maxN = rs.map(_._2).max
      rs.filter(_._2 == maxN)
        .minBy(t => t._4.split(",").map(_.toLong).toSeq)
    }.toSet
    query.stop()

    val batch = graft.operators.Dedup.sourceSketches(
        docs.toDF("source", "text"), k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(batch.nonEmpty && batch.exists(_._2 == 8L),
      s"degenerate fixture: no filled sketch in $batch")
    assert(latest === batch, s"stream latest $latest must equal batch $batch")

    // duplicate content is idempotent: replaying a prefix changes nothing
    val before = latest.map(t => t._1 -> t._4).toMap
    val again = graft.operators.Dedup.sourceSketches(
        (docs ++ docs.take(20)).toDF("source", "text"), k = 8)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(again === before, "duplicate content must not change any sketch")
  }
}

class StreamingSketchRocksDbSuite extends StreamingSketchSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingSketchInMemorySuite extends StreamingSketchSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
