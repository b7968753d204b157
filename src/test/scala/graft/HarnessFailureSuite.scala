package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** The harness must make failures LOUD (VERDICT r6 "what's wrong" #2):
  * a broken query used to vanish from Verify's output (read as "not run")
  * and to land in Bench as its time-to-throw (read as a win). These gates
  * drive the same code paths the driver runs — Verify.runQueries and
  * Bench.timeOne — against a deliberately-failing input.
  */
class HarnessFailureSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-harness-failure")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("Verify records a failing query in _failures.json instead of dropping it") {
    val out = Files.createTempDirectory("graft-verify-fail").toString
    // a nonexistent sf dir makes the chosen query fail at analysis — the
    // same failure class (pre-execution) that bit q54/q85 in r06
    val failures = Verify.runQueries(spark, "/nonexistent-sf-dir", out,
      only = Some(Set("q01_pricing_summary")))
    assert(failures.keySet === Set("q01_pricing_summary"))
    val recorded = Files.readString(Paths.get(s"$out/_failures.json"))
    assert(recorded.contains("q01_pricing_summary"),
      s"_failures.json must carry the failed query: $recorded")
    // and no result dir was written for it
    assert(!Files.exists(Paths.get(s"$out/q01_pricing_summary")))
  }

  test("Verify writes an EMPTY _failures.json when every query succeeds") {
    val out = Files.createTempDirectory("graft-verify-ok").toString
    val failures = Verify.runQueries(spark, "/root/testdata/sf0.001", out,
      only = Some(Set("q01_pricing_summary")))
    assert(failures.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_failures.json")) === "{}")
    assert(Files.exists(Paths.get(s"$out/q01_pricing_summary")))
  }

  test("Bench.timeOne returns a NEGATIVE time plus the error for a failing query") {
    val (sec, err) = Bench.timeOne(spark, "/nonexistent-sf-dir",
      SparkEntry.queries("q01_pricing_summary"))
    assert(sec < 0, s"a failed query must not record a positive time: $sec")
    assert(err.isDefined && err.get.nonEmpty)

    val (okSec, okErr) = Bench.timeOne(spark, "/root/testdata/sf0.001",
      SparkEntry.queries("q01_pricing_summary"))
    assert(okSec > 0 && okErr.isEmpty)
  }
}
