package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** asOfJoin contract corners the q60 fixture cannot reach: a most-recent
  * build row with a NULL value, build rows tied on the time axis, and the
  * reserved-name guard. Plus sampleFrames' sub-frame-size payloads.
  */
class AsOfJoinSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-asof")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a most-recent build row with NULL value yields NULL, not an older value") {
    val sql = spark
    import sql.implicits._
    val probe = Seq((1, 3L)).toDF("k", "t")
    val build = Seq((1, 1L, Some(5)), (1, 2L, None))
      .toDF("k", "t", "v")
    val got = AdvancedJoins.asOfJoin(probe, build, "k", "t", "v")
      .select("asof_v").collect()
    assert(got.length === 1 && got.head.isNullAt(0),
      s"expected NULL from the t=2 build row, got ${got.head}")
  }

  test("build rows tied on ord break deterministically to the largest value") {
    val sql = spark
    import sql.implicits._
    val probe = Seq((1, 7L)).toDF("k", "t")
    val build = Seq((1, 5L, "a"), (1, 5L, "b")).toDF("k", "t", "v")
    val results = (1 to 5).map { _ =>
      AdvancedJoins.asOfJoin(probe, build, "k", "t", "v")
        .select("asof_v").collect().head.getString(0)
    }
    assert(results.toSet === Set("b"), s"nondeterministic tie-break: $results")
  }

  test("probe rows with no prior build row get NULL; <= boundary matches") {
    val sql = spark
    import sql.implicits._
    val probe = Seq((1, 1L), (1, 5L)).toDF("k", "t")
    val build = Seq((1, 5L, 9)).toDF("k", "t", "v")
    val got = AdvancedJoins.asOfJoin(probe, build, "k", "t", "v")
      .orderBy("t").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getInt(2))))
    assert(got.toSeq === Seq(1L -> None, 5L -> Some(9))) // as-of is <=
  }

  test("tolerance: stale matches null out; boundary is inclusive; 0 = same-ord only") {
    val sql = spark
    import sql.implicits._
    val probe = Seq((1, 10L), (1, 13L), (1, 20L)).toDF("k", "t")
    val build = Seq((1, 10L, 100), (1, 12L, 120)).toDF("k", "t", "v")
    def run(tol: Option[Long]) =
      AdvancedJoins.asOfJoin(probe, build, "k", "t", "v", tol)
        .orderBy("t").collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getInt(2))))
        .toSeq
    assert(run(None) ===
      Seq(10L -> Some(100), 13L -> Some(120), 20L -> Some(120)))
    // gap to t=20 is 8 > 1: stale → null. gap 13−12 = 1 ≤ 1: inclusive.
    assert(run(Some(1L)) ===
      Seq(10L -> Some(100), 13L -> Some(120), 20L -> None))
    assert(run(Some(0L)) ===
      Seq(10L -> Some(100), 13L -> None, 20L -> None))
    intercept[IllegalArgumentException] {
      AdvancedJoins.asOfJoin(probe, build, "k", "t", "v", Some(-1L))
    }
  }

  test("reserved/colliding probe column names are rejected, not clobbered") {
    val sql = spark
    import sql.implicits._
    val probe = Seq((1, 3L, 42)).toDF("k", "t", "v") // probe already has 'v'
    val build = Seq((1, 1L, 5)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](
      AdvancedJoins.asOfJoin(probe, build, "k", "t", "v"))
    assert(e.getMessage.contains("rename"))
  }

  test("a probe frame already carrying the OUTPUT name asof_<buildVal> is rejected") {
    val sql = spark
    import sql.implicits._
    // 'asof_v' is what the join itself will emit — a probe column of that
    // name would survive the internal renames and collide at the output
    val probe = Seq((1, 3L, 42)).toDF("k", "t", "asof_v")
    val build = Seq((1, 1L, 5)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](
      AdvancedJoins.asOfJoin(probe, build, "k", "t", "v"))
    assert(e.getMessage.contains("asof_v"))
  }

  test("sampleFrames drops sub-frame-size payloads instead of throwing") {
    val sql = spark
    import sql.implicits._
    val media = Seq((1L, "tiny"), (2L, "x" * 40)) // 4 bytes → 0 frames; 40 → 2
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"),
        struct(lit("png").as("format")).as("meta"))
    val got = Multimodal.sampleFrames(media, 8)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1L)) // doc 1 absent, doc 2 has frame 0 only
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, 0))
  }
}
