package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `observe` metrics ride the curation plan as accumulators — the
  * monitoring hook for a 100 TB run, where re-counting survivors would
  * re-execute the whole pipeline. The observed totals must agree with the
  * materialized output.
  */
class PipelineObserveSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pipeline-observe")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("observed docs_kept / token_budget match the materialized result") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (out, obs) = Pipeline.curateWithMetrics(docs,
      minTokens = 10, maxTokens = 100, minTtr = 0.3, nearDupThreshold = 0.8)
    val rows = out.collect()
    val expectedTokens = rows.map(_.getAs[Int]("n_tokens").toLong).sum

    val metrics = obs.get
    assert(metrics("docs_kept") === rows.length.toLong)
    assert(metrics("token_budget") === expectedTokens)
  }

  test("two curations in one session get distinct Observations") {
    // Observation names must be unique per session — a hardcoded name
    // made the second registration collide. Default counter + explicit
    // tag both have to work, and each Observation reports its OWN run.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (outA, obsA) = Pipeline.curateWithMetrics(docs,
      minTokens = 10, maxTokens = 100, minTtr = 0.3, nearDupThreshold = 0.8)
    val (outB, obsB) = Pipeline.curateWithMetrics(docs,
      minTokens = 30, maxTokens = 60, minTtr = 0.3, nearDupThreshold = 0.8,
      tag = "strict")
    val a = outA.collect().length.toLong
    val b = outB.collect().length.toLong
    assert(a !== b, "fixture should make the two curations differ")
    assert(obsA.get("docs_kept") === a)
    assert(obsB.get("docs_kept") === b)
  }
}
