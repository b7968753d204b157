package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Oracle-dump hygiene: the r8 driver run shipped with q124's oracle SQL
  * still carrying the literal `__SF_TAG__` placeholder because the
  * promised substitution was never wired into `Verify.main` — DuckDB then
  * globbed a nonexistent path and the query stood as the round's only
  * error. This gate makes that whole class of break (a placeholder or a
  * side-dumped path that a rendered oracle quotes but the dump never
  * resolves) fail in `sbt test` before the driver ever sees it:
  *
  *  (a) no `__`-delimited placeholder survives [[Verify.renderedOracleSql]];
  *  (b) every absolute parquet path quoted in a rendered oracle exists on
  *      disk after `Verify.runQueries` has run the queries that quote one
  *      (side-dumping queries must have persisted what their oracle reads).
  */
class OracleHygieneSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-oracle-hygiene")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // `__SF_TAG__` and anything shaped like it ("__"-delimited upper token)
  private val placeholderRe = "__[A-Z][A-Z0-9_]*__".r
  // a quoted absolute path ending at its FIRST `.parquet` segment — for
  // `'/tmp/x.parquet/*.parquet'` this captures the directory `/tmp/x.parquet`
  private val quotedPathRe = "'(/[^']+?\\.parquet)".r

  test("raw oracle map uses only the declared SfTagToken placeholder") {
    // any other placeholder spelling would silently dodge the renderer
    val rogue = SparkEntry.oracleSql.collect {
      case (name, sql)
        if placeholderRe.findAllIn(sql).exists(_ != Verify.SfTagToken) =>
        name -> placeholderRe.findAllIn(sql).toList
    }
    assert(rogue.isEmpty, s"undeclared placeholders in oracle SQL: $rogue")
  }

  test("no placeholder survives a rendered oracle dump") {
    val leftover = Verify.renderedOracleSql(sfDir).collect {
      case (name, sql) if placeholderRe.findFirstIn(sql).isDefined =>
        name -> placeholderRe.findFirstIn(sql).get
    }
    assert(leftover.isEmpty,
      s"rendered oracle SQL still contains placeholders: $leftover")
  }

  test("every absolute path a rendered oracle quotes exists after its query runs") {
    val rendered = Verify.renderedOracleSql(sfDir)
    val refs: Seq[(String, String)] = rendered.toSeq.flatMap { case (n, sql) =>
      quotedPathRe.findAllMatchIn(sql).map(m => n -> m.group(1)).toSeq
    }
    assert(refs.nonEmpty,
      "expected at least one side-dumping oracle (q124); regex drift?")
    val out = Files.createTempDirectory("graft_oracle_hygiene").toString
    val failures =
      Verify.runQueries(spark, sfDir, out, Some(refs.map(_._1).toSet))
    assert(failures.isEmpty, s"side-dumping queries failed: $failures")
    refs.foreach { case (name, path) =>
      assert(new java.io.File(path).exists(),
        s"$name's oracle reads $path but the query never persisted it")
    }
  }

  test("histogram-family oracle shift literals match DefaultSubBits") {
    // the q158-family oracles replay bucketRep as
    // `(v >> greatest(0, length(bin(v)) - 1 - <subBits>)) << ...` with
    // the sub-bucket constant INLINED as a literal. If DefaultSubBits
    // ever moves while an oracle string keeps the old literal, every
    // band shifts subtly: the Spark side and the oracle would each be
    // internally consistent, and only the driver's hash gate — at round
    // end — would notice. Pin the coupling here instead.
    val sb = graft.operators.HistogramSketch.DefaultSubBits
    // the bucketed value is `v` in most oracles, a CAST(...) in q142's
    // funnel stage — match both (backtracking closes bin's parens)
    val shiftRe = """length\(bin\(.*?\)\) - 1 - (\d+)""".r
    val histOracles = SparkEntry.oracleSql.toSeq.collect {
      case (name, sql) if sql.contains("bin(") =>
        name -> shiftRe.findAllMatchIn(sql).map(_.group(1).toInt).toList
    }
    assert(histOracles.size >= 5,
      s"expected the q158 family's oracles to use bin(); regex drift? $histOracles")
    histOracles.foreach { case (name, shifts) =>
      assert(shifts.nonEmpty,
        s"$name: oracle uses bin() but no recognizable shift literal — " +
          "the bucketRep replay pattern changed; update this gate with it")
      assert(shifts.forall(_ == sb),
        s"$name: oracle shift literals $shifts != DefaultSubBits $sb — " +
          "a fit/oracle subBits mismatch produces subtly-shifted bands")
    }
  }
}
