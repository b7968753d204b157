package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables

/** ANN quality gate: both approximate paths (LSH, IVF) must recover a
  * healthy fraction of the exact top-k neighbor set — guards against
  * parameter regressions (a 12-bit LSH signature once measured 0.04
  * recall on this corpus).
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

  test("LSH and IVF recall ≥ 0.5 of exact top-5") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val lsh = pairs(Similarity.lshTopK(emb, queries, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, 5))
    val lshRecall = (exact & lsh).size.toDouble / exact.size
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(lshRecall >= 0.5, s"LSH recall $lshRecall")
    assert(ivfRecall >= 0.5, s"IVF recall $ivfRecall")
  }

  test("random-projection ANN recall ≥ 0.5 of exact top-5") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val rp = pairs(Similarity.rpTopK(emb, queries, 5))
    val rpRecall = (exact & rp).size.toDouble / exact.size
    assert(rpRecall >= 0.5, s"RP recall $rpRecall")
  }

  test("IVF-PQ recall ≥ 0.5 of exact top-5, ≥ plain IVF − 0.1") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, 5))
    val pq = pairs(Similarity.ivfPqTopK(emb, queries, 5))
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    val pqRecall = (exact & pq).size.toDouble / exact.size
    assert(pqRecall >= 0.5, s"IVF-PQ recall $pqRecall")
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

  test("cosinePairsLsh recall ≥ 0.5 of exact near-dup pairs") {
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
    assert(recall >= 0.5, s"cosine-LSH pair recall $recall")
  }
}
