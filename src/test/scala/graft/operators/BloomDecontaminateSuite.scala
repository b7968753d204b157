package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bloom-prefiltered decontamination: result identical to the exact
  * broadcast semi-join (the Bloom stage can only produce false POSITIVES
  * and those die in the confirm join), the plan carries the map-side
  * `might_contain` filter below the join, and degenerate sizing is
  * rejected up front.
  */
class BloomDecontaminateSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-bloom-decontaminate")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpusAndEval() = {
    val sql = spark
    import sql.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unrelated text about spark partitions and shuffles"),
      (102L, "what is the capital of france paris obviously"),
      (103L, "short doc")).toDF("doc_id", "text")
    val eval = Seq(
      (0L, "what is the capital of france"),
      (1L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    (corpus, eval)
  }

  test("bloom-prefiltered ids equal the exact semi-join ids") {
    val (corpus, eval) = corpusAndEval()
    val exact = TextOps.contaminatedIds(corpus, eval, n = 4)
      .collect().map(_.getLong(0)).toSet
    val bloomed = TextOps.contaminatedIdsBloom(corpus, eval, n = 4,
        expectedItems = 64L, numBits = 4096L)
      .collect().map(_.getLong(0)).toSet
    assert(exact === Set(100L, 102L))
    assert(bloomed === exact)
  }

  test("even a tiny (high-FP) filter stays exact — the confirm join removes FPs") {
    val (corpus, eval) = corpusAndEval()
    val exact = TextOps.contaminatedIds(corpus, eval, n = 4)
      .collect().map(_.getLong(0)).toSet
    // 8 bits for dozens of grams: nearly every probe is a Bloom hit, so
    // correctness here is carried entirely by the exact confirm join
    val bloomed = TextOps.contaminatedIdsBloom(corpus, eval, n = 4,
        expectedItems = 4L, numBits = 8L)
      .collect().map(_.getLong(0)).toSet
    assert(bloomed === exact)
  }

  test("plan: might_contain filters the gram stream BELOW the exact semi-join") {
    val (corpus, eval) = corpusAndEval()
    val plan = TextOps.contaminatedIdsBloom(corpus, eval, n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in plan:\n$plan")
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val bloomIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0, s"no broadcast semi-join in plan:\n$plan")
    // executed-plan text lists operators top-down: the filter must print
    // AFTER (= below) the join it feeds
    assert(bloomIdx > joinIdx,
      s"bloom filter not below the confirm join:\n$plan")
  }

  test("degenerate sizing is rejected up front") {
    val (corpus, eval) = corpusAndEval()
    intercept[IllegalArgumentException] {
      TextOps.contaminatedIdsBloom(corpus, eval, expectedItems = 0L)
    }
    intercept[IllegalArgumentException] {
      TextOps.contaminatedIdsBloom(corpus, eval, numBits = -1L)
    }
  }
}
