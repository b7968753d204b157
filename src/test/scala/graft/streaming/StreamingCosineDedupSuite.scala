package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming embedding near-dup: the hyperplane-bucket index lives in our
  * state providers; pairs surface within AND across batches; unrelated
  * directions never pair; and the pair set + cosines match the batch
  * [[graft.operators.Dedup.cosinePairsLsh]] on the same vectors (the
  * buckets are produced by the SAME lsh_sign_bits projection).
  */
abstract class StreamingCosineDedupSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-cosdedup-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // near-parallel pair (cos ≈ 0.9999), an orthogonal direction, and an
  // exact duplicate of the orthogonal arriving in a LATER batch
  private val vA = Seq(1.0, 0.2, 0.1, 0.05, 0.3, 0.0, 0.0, 0.7)
  private val vB = Seq(1.0, 0.2, 0.1, 0.05, 0.3, 0.0, 0.01, 0.7)
  private val vC = Seq(-0.3, 1.0, -0.2, 0.6, -1.0, 0.4, 0.9, -0.5)

  test(s"$suiteName: pairs within and across batches; orthogonal never pairs") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Seq[Double])]
    val pairs = StreamingCosineDedup.cosinePairsStream(
      input.toDS().toDF("vec_id", "embedding"), threshold = 0.95)

    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"scos_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scos-$suiteName").toString)
      .start()
    def got(): Set[(Long, Long)] =
      spark.table(s"scos_$suiteName").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch 1: A and the orthogonal C — nothing pairs
    input.addData((1L, vA), (3L, vC))
    query.processAllAvailable()
    assert(got().isEmpty, s"batch 1 must emit nothing: ${got()}")

    // batch 2: B arrives; the index remembers A through the SPI → (1,2).
    // C's exact copy 4 arrives too → (3,4). Nothing else.
    input.addData((2L, vB), (4L, vC))
    query.processAllAvailable()
    assert(got() == Set((1L, 2L), (3L, 4L)), s"batch 2: ${got()}")
    query.stop()
  }

  test(s"$suiteName: union over batches matches batch cosinePairsLsh") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Seq((1L, vA), (2L, vB), (3L, vC), (4L, vC))

    val input = MemoryStream[(Long, Seq[Double])]
    val pairs = StreamingCosineDedup.cosinePairsStream(
      input.toDS().toDF("vec_id", "embedding"), threshold = 0.95)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"scosp_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-scosp-$suiteName").toString)
      .start()
    all.grouped(2).foreach { g => input.addData(g: _*); query.processAllAvailable() }
    // a pair colliding in k tables emits ≤ k times — dedupe as callers do
    val streamed = spark.table(s"scosp_$suiteName").collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDouble(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    query.stop()

    val batch = graft.operators.Dedup.cosinePairsLsh(
        all.toDF("vec_id", "embedding"), threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream $streamed must equal batch $batch")
  }

  test(s"$suiteName: semDeDupStream losers == batch semDeDupLosers under a shared frozen model") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two orthogonal directions with exact copies (the SemDeDupSuite
    // fixture shape): copies co-cluster by construction, so stream and
    // batch agree at an exact-copy threshold regardless of fit quality
    def vec(group: Int, j: Long): Seq[Double] =
      (0 until 8).map { i =>
        val active = if (group == 0) i < 4 else i >= 4
        if (active) 1.0 + ((j * 31 + i * 17) % 11) / 10.0 else 0.0
      }
    val rows = (1L to 6L).map(j => (j, vec(0, j))) ++
      (51L to 56L).map(j => (j, vec(1, j))) ++
      Seq((101L, vec(0, 2L)), (201L, vec(1, 53L)))
    val batchDf = rows.toDF("vec_id", "embedding")

    val model = graft.operators.Dedup.fitSemDeDupModel(batchDf,
      nClusters = 2, iters = 3)
    val batchLosers = graft.operators.Dedup.semDeDupLosers(batchDf,
        threshold = 0.99999, nClusters = 2, iters = 3)
      .collect().map(_.getLong(0)).toSet
    assert(batchLosers === Set(101L, 201L), s"fixture truth: $batchLosers")

    val input = MemoryStream[(Long, Seq[Double])]
    val pairs = StreamingCosineDedup.semDeDupStream(
      input.toDS().toDF("vec_id", "embedding"), model, threshold = 0.99999)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"ssem_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ssem-$suiteName").toString)
      .start()
    // copies arrive in a LATER batch than their originals — the cell
    // index must remember across micro-batches
    input.addData(rows.filter(_._1 < 100L): _*)
    query.processAllAvailable()
    input.addData(rows.filter(_._1 >= 100L): _*)
    query.processAllAvailable()
    query.stop()

    val streamLosers = spark.table(s"ssem_$suiteName").collect()
      .map(r => math.max(r.getLong(0), r.getLong(1))).toSet
    assert(streamLosers === batchLosers,
      s"stream losers $streamLosers must equal batch $batchLosers")
  }
}

class StreamingCosineDedupRocksDbSuite extends StreamingCosineDedupSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingCosineDedupInMemorySuite extends StreamingCosineDedupSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
