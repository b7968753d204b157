package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** bigramLmScore semantics pinned against a hand-computed fixture (the
  * operator is rows-only in the oracle gate: cross-engine float-sum
  * ordering makes per-doc means hash-hostile, so exactness lives here).
  */
class BigramLmSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-bigram-lm")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("scores match the hand-computed conditional bigram model") {
    val sql = spark
    import sql.implicits._
    // corpus bigrams: doc1 = (a b)(b a)(a b), doc2 = (a b)(b b)(b a)
    // counts: c("a b")=3, c("b a")=2, c("b b")=1; histories: c(a ·)=3, c(b ·)=3
    val docs = Seq((1L, "a b a b"), (2L, "a b b a")).toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val d1 = (math.log(3.0 / 3) + math.log(2.0 / 3) + math.log(3.0 / 3)) / 3
    val d2 = (math.log(3.0 / 3) + math.log(1.0 / 3) + math.log(2.0 / 3)) / 3
    assert(got(1L)._2 === 3L && got(2L)._2 === 3L)
    assert(math.abs(got(1L)._1 - d1) < 1e-12, s"doc1 ${got(1L)._1} vs $d1")
    assert(math.abs(got(2L)._1 - d2) < 1e-12, s"doc2 ${got(2L)._1} vs $d2")
  }

  test("corpus-typical text outscores a doc with corpus-rare transitions") {
    val sql = spark
    import sql.implicits._
    val typical = (1L to 8L).map(i => (i, "the cat sat on the mat"))
    val rare = Seq((99L, "mat the on sat cat the"))
    val docs = (typical ++ rare).toDF("doc_id", "text")
    val scores = TextOps.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(99L),
      s"fluent ${scores(1L)} should beat scrambled ${scores(99L)}")
  }

  test("single-token and empty docs are excluded (no bigrams)") {
    val sql = spark
    import sql.implicits._
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val ids = TextOps.bigramLmScore(docs).collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }
}
