package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** SQ8 quantization fidelity gates: per-component reconstruction error is
  * bounded by scale/2, and the compressed search recovers (essentially)
  * the exact top-k thanks to the full-precision shortlist re-rank.
  */
class Sq8QuantizationSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-sq8")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("reconstruction error ≤ qscale/2 per component; codes span int8") {
    val emb = Tables.embeddings(spark, sfDir)
    val enc = Similarity.quantizeInt8(emb)
    val joined = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .join(enc, "vec_id")
      .withColumn("err", aggregate(
        zip_with(col("v"), col("qv"),
          (x, q) => abs(x - q.cast("double") * col("qscale"))),
        lit(0.0), (acc, e) => greatest(acc, e)))
    val stats = joined.agg(
      max(col("err")).as("max_err"),
      max(col("qscale")).as("max_scale"),
      min(aggregate(col("qv"), lit(127), (a, x) => least(a, x.cast("int")))).as("min_code"),
      max(aggregate(col("qv"), lit(-127), (a, x) => greatest(a, x.cast("int")))).as("max_code"))
      .head()
    val maxErr = stats.getDouble(0)
    val maxScale = stats.getDouble(1)
    // round-to-nearest: |x − code·scale| ≤ scale/2 (+ float slop)
    assert(maxErr <= maxScale / 2 + 1e-12, s"max reconstruction error $maxErr")
    // codes actually use the int8 range (the max-|x| component hits ±127)
    assert(stats.getInt(2) === -127 || stats.getInt(3) === 127)
  }

  test("sq8TopK recall ≥ 0.9 of exact top-5 (shortlist re-rank)") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    val sq8 = pairs(Similarity.sq8TopK(emb, queries, 5))
    val recall = (exact & sq8).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall")
  }

  test("zero vector quantizes to zero codes and never surfaces as a neighbor of itself") {
    val sql = spark
    import sql.implicits._
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(1f, 2f, -3f, 0.5f)),
      (2L, Array(1f, 2f, -3f, 0.4f)))
      .toDF("vec_id", "embedding")
    val enc = Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getDouble(2))).toMap
    assert(enc(0L)._1.forall(_ == 0) && enc(0L)._2 === 0.0)
    // search still works with a zero vector in the corpus
    val got = Similarity.sq8TopK(vecs, vecs.filter($"vec_id" === 1), 1).collect()
    assert(got.length === 1 && got.head.getAs[Long]("nid") === 2L)
    // ...and with a zero vector AS the query: undefined cosines rank last
    // (cos −2.0) instead of tripping ANSI divide-by-zero in either the
    // approx pass or the exact re-rank
    val zq = Similarity.sq8TopK(vecs, vecs.filter($"vec_id" === 0), 2).collect()
    assert(zq.length === 2)
    assert(zq.forall(_.getAs[Double]("cos_sim") === -2.0))
  }
}
