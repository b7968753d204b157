package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables

/** ANN quality gate: every approximate path must recover a healthy
  * fraction of the exact top-k neighbor set — guards against parameter
  * regressions (a 12-bit LSH signature once measured 0.04 recall on
  * this corpus).
  *
  * Floors are MEASURED-minus-margin (r13): every path here is fully
  * deterministic (hash-derived LSH planes, lowest-id-seeded k-means,
  * md5 sign matrix), so the fixture recalls are reproducible constants
  * — LSH 0.72, IVF 0.88, RP 0.74, IVF-PQ 0.86, cosine-pair LSH 0.76 —
  * and each gate pins its constant − 0.1. The old uniform ≥ 0.5 bar
  * would have let a banding bug halve IVF's effective recall (0.88 →
  * 0.55) without a test going red; these floors catch any drop bigger
  * than the margin.
  */
class AnnRecallSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH recall ≥ 0.62, IVF recall ≥ 0.78 of exact top-5 (measured 0.72 / 0.88)") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val lsh = pairs(Similarity.lshTopK(emb, queries, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, 5))
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(s"measured: LSH $lshRecall, IVF $ivfRecall")
    assert(lshRecall >= 0.62, s"LSH recall $lshRecall below measured-0.1 floor")
    assert(ivfRecall >= 0.78, s"IVF recall $ivfRecall below measured-0.1 floor")
  }

  test("random-projection ANN recall ≥ 0.64 of exact top-5 (measured 0.74)") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val rp = pairs(Similarity.rpTopK(emb, queries, 5))
    val rpRecall = (exact & rp).size.toDouble / exact.size
    info(s"measured: RP $rpRecall")
    assert(rpRecall >= 0.64, s"RP recall $rpRecall below measured-0.1 floor")
  }

  test("IVF-PQ recall ≥ 0.76 of exact top-5 (measured 0.86), ≥ plain IVF − 0.1") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, 5))
    val pq = pairs(Similarity.ivfPqTopK(emb, queries, 5))
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    val pqRecall = (exact & pq).size.toDouble / exact.size
    info(s"measured: IVF-PQ $pqRecall vs IVF $ivfRecall")
    assert(pqRecall >= 0.76, s"IVF-PQ recall $pqRecall below measured-0.1 floor")
    // the exact shortlist re-rank should keep PQ within a whisker of the
    // uncompressed IVF search (same probed cells, compressed shortlist)
    assert(pqRecall >= ivfRecall - 0.1,
      s"IVF-PQ recall $pqRecall fell too far below IVF $ivfRecall")
  }

  test("IVF-PQ on a corpus smaller than codebookK scores with the fitted stride") {
    // fitCentroids seeds from limit(codebookK): a 10-vector corpus fits
    // 10-entry codebooks, and the ADC table strides by that FITTED size.
    // Scoring with the configured codebookK=16 would read the wrong table
    // rows (or past the end) — this pins the fitted-k plumbing.
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
    val queries = emb.filter(col("vec_id") < 3)
    val pq = Similarity.ivfPqTopK(emb, queries, 5,
      nClusters = 2, nProbe = 2, numSub = 8, codebookK = 16)
    val rows = pq.collect()
    assert(rows.nonEmpty)
    // every query found neighbors and cosines are sane (in [-1, 1])
    assert(rows.map(_.getAs[Long]("qid")).toSet === Set(0L, 1L, 2L))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos_sim")) <= 1.0 + 1e-9))
  }

  test("cosinePairsLsh recall ≥ 0.66 of exact near-dup pairs (measured 0.76)") {
    // exact all-pairs at 0.35 with blocking disabled (single block) vs the
    // LSH-bucketed path over the same corpus
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("allblk", org.apache.spark.sql.functions.lit(1))
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.cosinePairs(emb, 0.35, blockCol = "allblk"))
    val lsh = pairSet(Dedup.cosinePairsLsh(emb, 0.35))
    assert(exact.nonEmpty, "fixture produced no exact near-dup pairs")
    // every LSH pair is exact-verified, so precision is 1 by construction
    assert((lsh -- exact).isEmpty, "LSH produced a pair the exact path did not")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"measured: cosine-LSH pair recall $recall")
    assert(recall >= 0.66, s"cosine-LSH pair recall $recall below measured-0.1 floor")
  }
}
