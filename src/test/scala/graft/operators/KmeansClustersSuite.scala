package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q106's gate: k-means-as-product separates obvious clusters, is
  * deterministic under repartitioning, and conserves the corpus
  * (cluster sizes sum to N; exemplar is the min id of its cluster).
  */
class KmeansClustersSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-kmeans-clusters")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("separates two obvious blobs; sizes conserve; exemplars are min ids") {
    val sql = spark
    import sql.implicits._
    // two tight blobs far apart; ids interleaved so init (2 lowest ids)
    // starts with one seed in each blob
    val vecs = Seq(
      (1L, Seq(0.0f, 0.1f)), (3L, Seq(0.1f, 0.0f)), (5L, Seq(0.05f, 0.05f)),
      (2L, Seq(10.0f, 10.1f)), (4L, Seq(10.1f, 10.0f)), (6L, Seq(9.95f, 10.05f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansClusters(vecs, k = 2, iters = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._2).sum == 6L, s"sizes must conserve: ${got.toSeq}")
    assert(got.forall(_._2 == 3L), s"two balanced blobs: ${got.toSeq}")
    // blob exemplars: min id per blob = 1 (odds) and 2 (evens)
    assert(got.map(_._4).toSet == Set(1L, 2L), s"exemplars: ${got.toSeq}")
    // tight blobs → tiny inertia
    assert(got.forall(_._3 < 0.1), s"inertia: ${got.toSeq}")
  }

  test("deterministic under repartitioning") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Similarity.kmeansClusters(emb, k = 4, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = Similarity.kmeansClusters(emb.repartition(7), k = 4, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == b, s"repartition changed the clustering:\n$a\nvs\n$b")
    assert(a.toSeq.map(_._2).sum == emb.count())
  }

  test("parameter validation") {
    val sql = spark
    import sql.implicits._
    val vecs = Seq((1L, Seq(0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Similarity.kmeansClusters(vecs, k = 0) }
    intercept[IllegalArgumentException] { Similarity.kmeansClusters(vecs, iters = 0) }
  }
}
