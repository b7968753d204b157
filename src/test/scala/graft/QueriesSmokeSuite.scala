package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Smoke: every declared query runs end-to-end at sf0.001 and the oracle
  * map stays in sync with the query map (the driver's hash-compare fails
  * closed on drift). Value-level correctness is the DuckDB oracle's job
  * (driver gate + tools/check_oracle.py).
  */
class QueriesSmokeSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-queries-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.allSpecs.foreach { spec =>
    test(s"${spec.name} runs at sf0.001") {
      val df = spec.fn(spark, sfDir)
      // count(), not collect(): exercises the full plan without driver blowup
      val n = df.count()
      assert(n >= 0)
    }
  }
}
