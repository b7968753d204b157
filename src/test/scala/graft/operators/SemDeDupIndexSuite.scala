package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch-incremental SemDeDup (the persisted cell index): build-time
  * losers ∪ incremental losers must equal the full frozen-model run over
  * the union corpus (in-cap cells); the probe reads only touched cells
  * (partition pruning at the IO level); retroactive member losers and
  * the union-size cap behave like the batch operator; append composes
  * across increments.
  */
class SemDeDupIndexSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-semdedup-index")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // for the streaming-composition gate (transformWithState)
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[graft.state.RocksDbStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val dim = 8

  /** Same two-orthogonal-directions fixture as SemDeDupSuite: group 0
    * lives in the first-half dims, group 1 in the second half. */
  private def vec(group: Int, j: Long): Seq[Double] =
    (0 until dim).map { i =>
      val active = if (group == 0) i < dim / 2 else i >= dim / 2
      if (active) 1.0 + ((j * 31 + i * 17) % 11) / 10.0 else 0.0
    }

  private def loadCents(dir: String): Array[(Int, Array[Double])] =
    spark.read.parquet(s"$dir/cells").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)

  test("build ∪ incremental ≡ full frozen-model run on the union; retroactive losers") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-semdd-idx").toString

    val gen0 = ((1L to 10L).map(j => (j, vec(0, j))) ++
      (51L to 60L).map(j => (j, vec(1, j)))).toDF("vec_id", "embedding")
    // batch: copies of 1 and 3 (batch-side losers), a copy of 51 with a
    // LOWER id (the retroactive case: indexed 51 must lose to 45), a
    // within-batch copy pair (150, 151), and a genuinely new direction
    val batch = Seq(
      (101L, vec(0, 1L)), (102L, vec(0, 3L)),
      (45L, vec(1, 51L)),
      (150L, vec(0, 77L)), (151L, vec(0, 77L)),
      // j ≡ 6 (mod 11): the one residue gen0's 51..60 does NOT cover —
      // the jitter pattern has period 11, so any covered residue would
      // silently be an exact copy of an indexed vector
      (200L, vec(1, 61L))).toDF("vec_id", "embedding")

    Dedup.buildSemDeDupIndex(gen0, dir, nClusters = 2, iters = 3)
    val cents = loadCents(dir)
    assert(cents.length === 2)

    val t = 0.99999
    val buildLosers = Dedup.semDeDupLosersFrozen(gen0, cents, t)
      .collect().map(_.getLong(0)).toSet
    val incrLosers = Dedup.semDeDupIncremental(batch, dir, t)
      .collect().map(_.getLong(0)).toSet
    val fullLosers = Dedup.semDeDupLosersFrozen(
        gen0.unionByName(batch), cents, t)
      .collect().map(_.getLong(0)).toSet

    assert(buildLosers.isEmpty, s"gen0 has no internal copies: $buildLosers")
    assert(incrLosers === Set(101L, 102L, 51L, 151L),
      s"batch copies lose to min-id (incl. indexed 51 to batch 45): $incrLosers")
    assert(buildLosers ++ incrLosers === fullLosers,
      s"incremental must equal the full frozen run: " +
        s"incr=$incrLosers full=$fullLosers")

    // append landed: a SECOND increment dups against the first batch
    val batch2 = Seq((300L, vec(0, 77L))).toDF("vec_id", "embedding")
    val incr2 = Dedup.semDeDupIncremental(batch2, dir, t)
      .collect().map(_.getLong(0)).toSet
    assert(incr2 === Set(300L),
      s"the appended 150 must be probed by the next increment: $incr2")
  }

  test("incremental ∪ build equals the streaming twin under the index's frozen model") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-semdd-stream").toString
    val gen0 = ((1L to 10L).map(j => (j, vec(0, j))) ++
      (51L to 60L).map(j => (j, vec(1, j)))).toDF("vec_id", "embedding")
    val batch = Seq((101L, vec(0, 1L)), (45L, vec(1, 51L)),
      (150L, vec(0, 77L)), (151L, vec(0, 77L))).toDF("vec_id", "embedding")
    Dedup.buildSemDeDupIndex(gen0, dir, nClusters = 2, iters = 3)
    val cents = loadCents(dir)
    val t = 0.99999

    val offline =
      Dedup.semDeDupLosersFrozen(gen0, cents, t)
        .collect().map(_.getLong(0)).toSet ++
      Dedup.semDeDupIncremental(batch, dir, t)
        .collect().map(_.getLong(0)).toSet

    // the same two generations as two micro-batches through the ONLINE
    // twin, under the SAME frozen cells — the three serve paths (inline
    // frozen, persisted-index incremental, streaming state) must agree
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingCosineDedup.semDeDupStream(
        input.toDS().toDF("vec_id", "embedding"), cents, threshold = t)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("semdd_idx_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-semdd-stream-ck").toString)
      .start()
    input.addData((1L to 10L).map(j => (j, vec(0, j))) ++
      (51L to 60L).map(j => (j, vec(1, j))): _*)
    q.processAllAvailable()
    input.addData((101L, vec(0, 1L)), (45L, vec(1, 51L)),
      (150L, vec(0, 77L)), (151L, vec(0, 77L)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("semdd_idx_stream").collect()
      .map(r => math.max(r.getLong(0), r.getLong(1))).toSet
    assert(streamed === offline,
      s"stream=$streamed must equal build ∪ incremental=$offline")
  }

  test("probe reads only touched cells: the cid filter is a partition filter") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-semdd-prune").toString
    val gen0 = ((1L to 10L).map(j => (j, vec(0, j))) ++
      (51L to 60L).map(j => (j, vec(1, j)))).toDF("vec_id", "embedding")
    Dedup.buildSemDeDupIndex(gen0, dir, nClusters = 2, iters = 3)

    val probe = Dedup.indexMembers(spark, dir, Seq(0))
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the probe plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cid")),
      s"cid must prune at the partition level, got ${scan.partitionFilters}")
    // and the pruning is real at the IO level: one cell's directory
    // survives partition listing, not both
    def partsOf(touched: Seq[Int]): Int =
      Dedup.indexMembers(spark, dir, touched)
        .queryExecution.executedPlan.collectFirst {
          case f: FileSourceScanExec => f.selectedPartitions.partitionCount
        }.get
    assert(partsOf(Seq(0)) === 1 && partsOf(Seq(0, 1)) === 2,
      "touched-cell read must list only its own cell directories")
  }

  test("union-size cap drops a cell the batch pushes over; untouched cells unaffected") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-semdd-cap").toString
    val gen0 = ((1L to 10L).map(j => (j, vec(0, j))) ++
      (51L to 60L).map(j => (j, vec(1, j)))).toDF("vec_id", "embedding")
    Dedup.buildSemDeDupIndex(gen0, dir, nClusters = 2, iters = 3)
    // cap 12: group 0's cell holds 10 members; a 3-vector batch (incl. a
    // copy) pushes the union to 13 — over cap, the whole cell drops from
    // pairing. group 1's cell gets one copy and stays in cap.
    val batch = Seq(
      (101L, vec(0, 1L)), (102L, vec(0, 2L)), (103L, vec(0, 3L)),
      (201L, vec(1, 51L))).toDF("vec_id", "embedding")
    val losers = Dedup.semDeDupIncremental(batch, dir, threshold = 0.99999,
        maxClusterSize = 12)
      .collect().map(_.getLong(0)).toSet
    assert(losers === Set(201L),
      s"over-cap cell must pair nothing, in-cap cell still dedups: $losers")
  }
}
