package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Skew-guard semantics of the dedup operators: capped tokens/buckets
  * bound candidate generation without corrupting the scores of surviving
  * pairs.
  */
class DedupGuardSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dedup-guards")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("jaccardPairs: df-capped tokens skip candidate gen but still score") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "src", "common a b c"),
      (2L, "src", "common a b c"),
      (3L, "src", "common z y w q"))
      .toDF("doc_id", "source", "text")
    // 'common' has df 3 > cap 2 → excluded from the inverted index; a/b/c
    // (df 2) still generate the (1,2) candidate
    val pairs = Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 2).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert((p.getLong(0), p.getLong(1)) === (1L, 2L))
    // the capped token must still count in the exact score: 4/4, not 3/4
    assert(p.getDouble(2) === 1.0)
  }

  test("jaccardPairs: pairs sharing only capped tokens are the documented loss") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "src", "common common2"),
      (2L, "src", "common common2"))
      .toDF("doc_id", "source", "text")
    // every shared token is block-wide → candidate never generated
    assert(Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 1).count() === 0)
    // with the guard loose the pair is exact-dup, jaccard 1.0
    assert(Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 10).count() === 1)
  }

  test("simhashPairs: degenerate buckets are dropped by the cap") {
    val sql = spark
    import sql.implicits._
    val docs = (1L to 6L).map(i => (i, s"identical text payload"))
      .toDF("doc_id", "text")
    // all 6 docs share one simhash → every band-bucket holds 6 docs
    assert(Dedup.simhashPairs(docs, 3, maxBucketSize = 5).count() === 0)
    assert(Dedup.simhashPairs(docs, 3, maxBucketSize = 6).count() === 15) // C(6,2)
  }
}
