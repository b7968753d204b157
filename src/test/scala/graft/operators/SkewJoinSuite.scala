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

  test("saltedJoin is result-identical to the plain join, for every allowed type") {
    val sql = spark
    import sql.implicits._
    // hot key 0 (many rows), matched keys 1..3, UNMATCHED skewed key 99,
    // and an unmatched other-side key 50 — exercises every orientation
    val skewed = (Seq.fill(500)((0L, "hot")) ++
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (99L, "lonely"))).toDF("k", "v")
    val other = Seq((0L, "dim0"), (1L, "dim1"), (2L, "dim2"), (3L, "dim3"),
      (50L, "never")).toDF("k", "dim")
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = skewed.join(other, Seq("k"), jt)
      val salted = AdvancedJoins.saltedJoin(skewed, other, Seq("k"), 4, jt)
      assert(salted.columns.toSeq === plain.columns.toSeq, s"schema drift for $jt")
      val p = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val s2 = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(s2 === p, s"multiset mismatch for join type $jt")
    }
    intercept[IllegalArgumentException] {
      AdvancedJoins.saltedJoin(skewed, other, Seq("k"), 4, "full_outer")
    }
    intercept[IllegalArgumentException] {
      AdvancedJoins.saltedJoin(skewed, other, Seq("k"), 0)
    }
  }

  test("saltedJoin skips the salt when the other side is broadcastable") {
    val sql = spark
    import sql.implicits._
    val skewed = Seq.fill(100)((0L, "hot")).toDF("k", "v")
    val other = Seq((0L, "dim")).toDF("k", "dim")
    // this session disables auto-broadcast (threshold -1), so the gate
    // must default to salting; identity is covered by the test above
    val saltedDefault = AdvancedJoins.saltedJoin(skewed, other, Seq("k"), 8)
    assert(saltedDefault.queryExecution.optimizedPlan.toString
      .contains("__salt"), "threshold -1 must keep the salt")
    try {
      // an explicit cutoff far above the 1-row other side → plain join
      spark.conf.set("spark.graft.saltedJoin.minOtherBytes", "1000000000")
      val gated = AdvancedJoins.saltedJoin(skewed, other, Seq("k"), 8)
      assert(!gated.queryExecution.optimizedPlan.toString.contains("__salt"),
        "broadcastable other side must skip the salt")
      assert(gated.collect().length === 100)
      // cutoff 0 forces the salt back on
      spark.conf.set("spark.graft.saltedJoin.minOtherBytes", "0")
      val forced = AdvancedJoins.saltedJoin(skewed, other, Seq("k"), 8)
      assert(forced.queryExecution.optimizedPlan.toString.contains("__salt"),
        "minOtherBytes=0 must force the salt")
    } finally spark.conf.unset("spark.graft.saltedJoin.minOtherBytes")
  }

  test("saltedJoin spreads the hot key across salt sub-keys") {
    val sql = spark
    import sql.implicits._
    val skewed = Seq.fill(1000)((0L, "hot")).zipWithIndex
      .map { case ((k, v), i) => (k, v + i) }.toDF("k", "v")
    val other = Seq((0L, "dim")).toDF("k", "dim")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(8)).cast("int"))
    val n = salted.select("__salt").distinct().count()
    assert(n >= 6, s"content-hash salt should hit most of 8 sub-keys, got $n")
  }
}
