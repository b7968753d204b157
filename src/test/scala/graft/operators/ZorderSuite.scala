package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Z-order layout: the encode matches the classic bit-interleave exactly,
  * and range-partitioning by z gives BOTH dimensions bounded per-partition
  * ranges — the property footer-stats file skipping needs — where a
  * single-column sort leaves the other dimension unbounded.
  */
class ZorderSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-zorder")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mortonRef(a: Int, b: Int): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      x = (x | (x << 1)) & 0x55555555L
      x
    }
    spread(a.toLong) | (spread(b.toLong) << 1)
  }

  test("zValue2 equals the reference bit-interleave on corner and random values") {
    val sql = spark
    import sql.implicits._
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (255, 256), (12345, 0), (65535, 0),
      (65536 + 7, 3)) // 65543 must wrap to 7 via the &0xFFFF mask
    val got = cases.toDF("a", "b")
      .select($"a", $"b", Pipeline.zValue2($"a", $"b").as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) === mortonRef(a & 0xFFFF, b), s"($a, $b)")
    }
    // interleave structure: z of (a,0) uses even bits only, (0,b) odd bits
    assert(got((12345, 0)) === mortonRef(12345, 0))
    assert((got((65535, 0)) & 0xAAAAAAAAL) === 0L)
  }

  test("z-layout bounds BOTH dimensions per partition; a single-dim sort does not") {
    val sql = spark
    import sql.implicits._
    // 64x64 grid, one row per cell — uniform in both dims
    val grid = spark.range(4096)
      .select(($"id" % 64).cast("int").as("a"), ($"id" / 64).cast("int").as("b"))
    val parts = 16

    def partitionSpans(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] =
      df.select($"a", $"b")
        .mapPartitions { it =>
          val rows = it.toSeq
          if (rows.isEmpty) Iterator.empty
          else {
            val as = rows.map(_.getInt(0)); val bs = rows.map(_.getInt(1))
            Iterator((as.max - as.min, bs.max - bs.min))
          }
        }.collect().toSeq

    val zSpans = partitionSpans(Pipeline.zorderLayout(grid.toDF(), $"a", $"b", parts))
    val aSpans = partitionSpans(
      grid.repartitionByRange(parts, $"a").sortWithinPartitions($"a"))

    // a-sorted layout: dimension b spans the whole 0..63 range in every
    // partition — a filter on b can never skip a partition
    assert(aSpans.forall(_._2 === 63), s"a-sort spans: $aSpans")
    // z layout: EVERY partition covers a bounded box in both dimensions
    // (16 partitions of a 64x64 z-curve = 16x16 tiles, span 15; allow
    // slack for range-sampling boundary wobble)
    assert(zSpans.nonEmpty)
    zSpans.foreach { case (da, db) =>
      assert(da <= 31 && db <= 31, s"unbounded box in z layout: $zSpans")
    }
    // ... which is what makes a 2-dim box query skip partitions: count
    // partitions whose box intersects a 8x8 query box at (40..47, 8..15)
    def touched(df: org.apache.spark.sql.DataFrame): Int =
      df.select($"a", $"b").mapPartitions { it =>
        val rows = it.toSeq
        if (rows.isEmpty) Iterator.empty
        else {
          val as = rows.map(_.getInt(0)); val bs = rows.map(_.getInt(1))
          val hit = as.min <= 47 && as.max >= 40 && bs.min <= 15 && bs.max >= 8
          Iterator(if (hit) 1 else 0)
        }
      }.collect().sum
    val zTouched = touched(Pipeline.zorderLayout(grid.toDF(), $"a", $"b", parts))
    val aTouched = touched(
      grid.repartitionByRange(parts, $"a").sortWithinPartitions($"a"))
    assert(zTouched < aTouched,
      s"z-order should touch fewer partitions: z=$zTouched vs a-sort=$aTouched")
    assert(zTouched <= 4, s"8x8 box should touch few z-tiles, got $zTouched")
  }

  test("degenerate partition count is rejected") {
    val sql = spark
    import sql.implicits._
    intercept[IllegalArgumentException] {
      Pipeline.zorderLayout(spark.range(4).toDF(), $"id", $"id", 0)
    }
  }
}
