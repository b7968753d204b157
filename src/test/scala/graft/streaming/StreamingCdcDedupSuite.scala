package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming CDC dedup: the chunk-digest index lives in our state
  * providers; shared-digest hits surface within AND across batches;
  * unrelated docs never pair; the prospective digest cap silences
  * boilerplate chunks; and a full replay's aggregated pairs match the
  * batch [[graft.operators.TextOps.cdcNearDupPairs]] pair set exactly
  * (same `cdcChunkRowsOf` boundary rule — one definition; digests are
  * exact keys, so hits-per-pair ARE the shared distinct digests, no
  * banding dedupe needed).
  */
abstract class StreamingCdcDedupSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-cdcdedup-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val body = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val other = (1 to 50).map(i => s"w$i x$i").mkString(" ")

  test(s"$suiteName: hits within and across batches; unrelated never pairs") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val hits = StreamingCdcDedup.cdcHitsStream(
      input.toDS().toDF("doc_id", "text"))
    val query = hits.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"scdc_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scdc-$suiteName").toString)
      .start()
    def pairs(): Set[(Long, Long)] =
      spark.table(s"scdc_$suiteName").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch 1: 1 and 2 share tail chunks (insertion re-syncs boundaries);
    // 3 is unrelated
    input.addData((1L, body), (2L, "inserted preamble text here " + body),
      (3L, other))
    query.processAllAvailable()
    assert(pairs() == Set((1L, 2L)), s"batch 1: ${pairs()}")

    // batch 2: 4 (copy of 1) arrives — the SPI index remembers batch 1
    input.addData((4L, body))
    query.processAllAvailable()
    assert(pairs() == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"batch 2: ${pairs()}")

    // null text contributes nothing and must not kill the query
    input.addData((5L, null: String))
    query.processAllAvailable()
    assert(pairs() == Set((1L, 2L), (1L, 4L), (2L, 4L)))

    // a RE-DELIVERED doc (crawler re-fetch) is a replay: it must emit no
    // new hits and must not double its member entry — a second member
    // copy would double n_shared for every later arrival (batch dedups
    // its (doc, digest) stream; the stream must match)
    val before = spark.table(s"scdc_$suiteName").count()
    input.addData((1L, body))
    query.processAllAvailable()
    assert(spark.table(s"scdc_$suiteName").count() === before,
      "re-delivery must emit nothing")
    input.addData((6L, body)) // pairs with 1 and 4 — ONCE each per digest
    query.processAllAvailable()
    val hitRows = spark.table(s"scdc_$suiteName").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perPair = hitRows.groupBy(identity).view.mapValues(_.length)
    val n14 = perPair.getOrElse((1L, 6L), 0)
    val n46 = perPair.getOrElse((4L, 6L), 0)
    assert(n14 > 0 && n14 === n46,
      s"doc 6 must hit 1 and 4 symmetrically (no doubled member): $n14 vs $n46")
    query.stop()
  }

  test(s"$suiteName: replay pairs ≡ batch cdcNearDupPairs; cap admits nothing") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // near-dup families: same (id % 5) docs share a body with distinct
    // edits; buckets stay under the cap so prospective ≡ retrospective
    val docs = (1L to 30L).map { i =>
      val base = (1 to 60).map(j => s"s${i % 5}t$j").mkString(" ")
      val edit = if (i < 15) base else s"edit$i preamble here " + base
      (i, edit)
    }

    val input = MemoryStream[(Long, String)]
    val hits = StreamingCdcDedup.cdcHitsStream(
      input.toDS().toDF("doc_id", "text"))
    val query = hits.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"scdcp_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scdcp-$suiteName").toString)
      .start()
    docs.grouped(7).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    val streamed = StreamingCdcDedup.pairsOfHits(
        spark.table(s"scdcp_$suiteName"), minFrac = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    query.stop()

    val batch = graft.operators.TextOps.cdcNearDupPairs(
        docs.toDF("doc_id", "text"), minFrac = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(batch.nonEmpty, "degenerate fixture: no batch near-dup pairs")
    assert(streamed == batch, s"stream $streamed must equal batch $batch")

    // cap: copies of one doc through a cap-1 stream emit nothing
    val capIn = MemoryStream[(Long, String)]
    val capped = StreamingCdcDedup.cdcHitsStream(
      capIn.toDS().toDF("doc_id", "text"), maxBucketSize = 1)
    val capQ = capped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"scdcc_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scdcc-$suiteName").toString)
      .start()
    capIn.addData((1L to 10L).map(i => (i, body)): _*)
    capQ.processAllAvailable()
    assert(spark.table(s"scdcc_$suiteName").count() == 0L,
      "cap-1 digest buckets admit one member and emit no hits")
    capQ.stop()

    // clamped tier through the stream: a doc and its copy share exactly
    // the CLAMPED chunk topology — hits per pair = cdcChunksClamped's
    // distinct digest count (the shared-kernel guarantee)
    val clampIn = MemoryStream[(Long, String)]
    val clamped = StreamingCdcDedup.cdcHitsStream(
      clampIn.toDS().toDF("doc_id", "text"), minLen = 16, maxLen = 64)
    val clampQ = clamped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"scdcl_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scdcl-$suiteName").toString)
      .start()
    clampIn.addData((1L, body), (2L, body))
    clampQ.processAllAvailable()
    val hitsN = spark.table(s"scdcl_$suiteName").count()
    clampQ.stop()
    val wantN = graft.operators.TextOps.cdcChunksClamped(
        Seq((1L, body)).toDF("doc_id", "text"), minLen = 16, maxLen = 64)
      .select("digest").distinct().count()
    assert(hitsN === wantN && wantN > 0,
      s"clamped stream hits ($hitsN) must equal the clamped distinct digest count ($wantN)")
  }
}

class StreamingCdcDedupRocksDbSuite extends StreamingCdcDedupSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingCdcDedupInMemorySuite extends StreamingCdcDedupSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
