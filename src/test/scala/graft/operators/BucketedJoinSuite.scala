package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The bucketing scale lever: fact tables bucketed on their join key
  * co-locate, so a fact-fact join runs with NO exchange on either side —
  * at 100 TB this is the difference between a terabyte shuffle per join
  * and none. Verified on the actual physical plan.
  */
class BucketedJoinSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketed-join")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      // make the no-shuffle effect unambiguous in the plan
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed fact-fact join plans with zero exchanges") {
    val sfDir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("price"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must consume the bucketed scans directly: the only
    // allowed exchange is the one ABOVE the aggregation is also avoided
    // because grouping is on the same key — so: zero shuffle exchanges
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)

    // and it computes the right thing vs the unbucketed plan
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("price"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = joined.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expected)
  }

  test("persisted bucketed tokenIndex: incremental near-dup shuffles only the batch") {
    // The q81 story at 100 TB: the corpus's inverted token index is the
    // persisted artifact, bucketed on the join key — each day's probe
    // pays ONE exchange (its own, batch-sized) while the corpus-sized
    // index side reads straight from its buckets.
    val sql = spark
    import sql.implicits._
    val corpus = Seq((10L, "s", "a b c"), (11L, "s", "a b c d"), (12L, "s", "x y z"))
      .toDF("doc_id", "source", "text")
    val batch = Seq((1L, "s", "a b c"), (2L, "s", "x q r")).toDF("doc_id", "source", "text")

    Dedup.tokenIndex(corpus).write.mode("overwrite")
      .bucketBy(4, "blk", "tok").saveAsTable("token_index")

    val pairs = Dedup.jaccardPairsIncremental(
      spark.table("token_index"), batch, 0.5)
    val plan = pairs.queryExecution.sparkPlan
    // the INDEX side must feed its join straight from its buckets: no
    // shuffle subtree may contain the token_index scan (the batch-sized
    // probe/aggregation exchanges are expected and fine). Spark only
    // keeps Bucketed: true when the bucketing is actually exploited
    // (autoBucketedScan disables useless bucketed reads).
    assert(plan.toString.contains("Bucketed: true"),
      s"index side should read its buckets directly:\n$plan")
    val shuffledIndexScans = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.collectLeaves().exists(_.toString.contains("token_index")) => e
    }
    assert(shuffledIndexScans.isEmpty,
      s"the corpus-sized index must never shuffle:\n$plan")

    val got = pairs.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (11L, 1L)), s"got $got")
  }
}
