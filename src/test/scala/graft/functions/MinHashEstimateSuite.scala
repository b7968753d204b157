package graft.functions

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Statistical quality of the MinHash Jaccard estimator: with 64 lanes the
  * estimate's standard error is ~1/sqrt(64) ≈ 0.125 per pair, so the MEAN
  * absolute error over many deterministic pairs must come in well under
  * that, and the estimator must be unbiased enough to rank pairs.
  */
class MinHashEstimateSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-minhash-estimate")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("64-lane estimate tracks true Jaccard (mean |err| < 0.08)") {
    val sql = spark
    import sql.implicits._
    // deterministic pair family: base vocabulary of 40 tokens; pair i keeps
    // `i` shared tokens and pads both sides to 40 with disjoint tokens →
    // true jaccard = i / (80 - i)
    val pairs = (0 to 40 by 2).map { shared =>
      val common = (0 until shared).map(j => s"c$j")
      val a = common ++ (0 until (40 - shared)).map(j => s"a$j")
      val b = common ++ (0 until (40 - shared)).map(j => s"b$j")
      (shared, a, b)
    }.toDF("shared", "toks_a", "toks_b")

    val est = aggregate(
      zip_with(
        HashFunctions.minhash64($"toks_a", 64),
        HashFunctions.minhash64($"toks_b", 64),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / 64

    val rows = pairs
      .withColumn("true_j", $"shared".cast("double") / (lit(80) - $"shared"))
      .withColumn("est_j", est)
      .select($"true_j", $"est_j")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))

    val meanAbsErr = rows.map { case (t, e) => math.abs(t - e) }.sum / rows.length
    assert(meanAbsErr < 0.08, s"mean |err| $meanAbsErr over ${rows.length} pairs")
    // monotonicity in the large: estimates must rank disjoint vs identical
    val (loTrue, loEst) = rows.minBy(_._1)
    val (hiTrue, hiEst) = rows.maxBy(_._1)
    assert(loTrue === 0.0 && loEst < 0.2)
    assert(hiTrue === 1.0 && hiEst === 1.0)
  }
}
