package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The partition-pruning scale lever: a dataset written `partitionBy` a
  * filter column turns equality/range predicates into directory pruning —
  * at 100 TB a per-day or per-source layout means a filtered query lists
  * and reads a sliver of the table, before any row is decoded. Verified
  * on the executed plan's scan metrics (files actually read), and dynamic
  * partition pruning (DPP) is verified for the join-driven case where the
  * pruning values only exist at runtime.
  */
class PartitionPruningSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  @transient private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-partition-pruning")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("graft-part").toString
    // events laid out per event_type — the per-source/per-day pattern
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite")
      .parquet(s"$dir/events_by_type")
    // file-backed dimension (DPP does not fire for LocalRelation dims)
    spark.createDataFrame(Seq(("error", 1), ("click", 0), ("view", 0), ("purchase", 0)))
      .toDF("event_type", "is_alert")
      .write.mode("overwrite").parquet(s"$dir/type_dim")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Files actually read by the partitioned scan of an EXECUTED df. */
  private def scanFilesRead(df: DataFrame): Long = {
    // AQE hides executed subtrees behind AdaptiveSparkPlanExec.executedPlan
    // and materialized QueryStageExec.plan — neither is a tree child, so a
    // plain collect() would miss the scans
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val partitioned = scans(df.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.nonEmpty)
    assert(partitioned.nonEmpty, "no partitioned file scan in executed plan")
    partitioned.map(_.metrics("numFiles").value).sum
  }

  test("static predicate prunes to one partition directory") {
    val df = spark.read.parquet(s"$dir/events_by_type")
      .filter(col("event_type") === "error")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), s"no PartitionFilters section:\n$p")
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(p).isDefined,
      s"event_type predicate did not become a partition filter:\n$p")
    // the predicate must NOT appear as a row-level pushed filter (the
    // matching rows are selected by directory, never decoded + compared)
    assert(!"PushedFilters: \\[[^\\]]*event_type".r.findFirstIn(p).isDefined,
      s"partition predicate leaked into the row-level scan:\n$p")

    // physical proof from the executed scan: only event_type=error files
    // (collect() — not head(), which executes a separate limited plan
    // whose metrics never land on this queryExecution)
    val expected = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "error").count()
    assert(df.collect()(0).getLong(0) === expected)
    val errorDirFiles = spark.read.parquet(s"$dir/events_by_type")
      .inputFiles.count(_.contains("event_type=error"))
    val totalFiles = spark.read.parquet(s"$dir/events_by_type").inputFiles.length
    assert(scanFilesRead(df) === errorDirFiles,
      s"scan read more than the pruned directory")
    assert(errorDirFiles < totalFiles, "fixture degenerate: only one partition")
  }

  test("dynamic partition pruning from a dimension-side filter") {
    // the classic DPP shape: the partition keys to keep are only known by
    // joining a filtered dimension — Spark injects a runtime subquery
    // filter into the partitioned scan instead of reading every partition
    val dim = spark.read.parquet(s"$dir/type_dim").filter(col("is_alert") === 1)
    val joined = spark.read.parquet(s"$dir/events_by_type")
      .join(dim, Seq("event_type"))
      .agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$p")
    val expected = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "error").count()
    assert(joined.collect()(0).getLong(0) === expected)
    // the runtime scan read only the surviving partition's files
    val errorDirFiles = spark.read.parquet(s"$dir/events_by_type")
      .inputFiles.count(_.contains("event_type=error"))
    assert(scanFilesRead(joined) === errorDirFiles,
      "DPP did not prune the partitioned scan at runtime")
  }
}
