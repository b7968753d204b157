package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The skew lever for fact-fact joins at 100 TB: one hot key must not
  * serialize the whole stage onto one task. AQE's skew-join split is the
  * declarative answer — this pins that our session conf actually triggers
  * it (a misconfigured threshold silently degrades to the single-task
  * plan, which is exactly the failure you only notice at scale).
  */
class SkewJoinSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-skew-join")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      // force the shuffled path so the skew machinery is what's under test
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // scaled-down thresholds: the hot partition below is ~MBs, not GBs
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits the hot key's partition instead of one giant task") {
    val sql = spark
    import sql.implicits._
    // 100k rows on ONE key + a long payload vs a sprinkle on 50 others:
    // the classic web-crawl shape (one domain dominating a dedup block)
    val hot = spark.range(100000).select(lit(0L).as("k"),
      concat(lit("payload-"), col("id").cast("string"),
        lit("x" * 64)).as("v"))
    val rest = spark.range(500).select((col("id") % 50 + 1).as("k"),
      col("id").cast("string").as("v"))
    val left = hot.union(rest)
    val right = spark.range(51).select(col("id").as("k"),
      col("id").cast("string").as("dim"))

    val joined = left.join(right, "k")
    // collect() (not count()) drives THIS Dataset's adaptive plan to its
    // final form — count() would execute a different (aggregated) plan
    assert(joined.collect().length === 100500)

    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the hot partition as skewed:\n$finalPlan")
  }
}
