package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Video keyframe near-dup: trimmed same-seed copies pair at full
  * overlap, the banded generation is LOSSLESS at maxHamming ≤ 3
  * (pigeonhole — gated against an in-suite brute force over all frame
  * pairs), and the bucket cap prunes candidacy without corrupting
  * keyframe denominators.
  */
class VideoNearDupSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-video-neardup")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def hashesFor(ids: Seq[Long]) = {
    val sql = spark
    import sql.implicits._
    Multimodal.dHashFrames(
      Multimodal.withVideoKeyframes(ids.toDF("doc_id"))).toDF()
  }

  test("trimmed same-seed copies: every keyframe of the shorter clip matches") {
    // 0 and 25 share seed 0: nf(0)=10 -> keyframes {0,8}; nf(25)=35 ->
    // {0,8,16,24,32}. The shorter clip's frames are a strict prefix.
    val rows = Multimodal.videoNearDupClips(hashesFor(Seq(0L, 25L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq === Seq((0L, 25L, 2L, 2L, 5L, 1.0)),
      s"trimmed copy must pair at frac 1.0: ${rows.toSeq}")
  }

  test("banded generation is lossless at maxHamming <= 3 (brute-force parity)") {
    val sql = spark
    import sql.implicits._
    val ids = Seq(0L, 1L, 7L, 25L, 26L, 32L, 50L, 77L)
    val hashes = hashesFor(ids)
    val got = Multimodal.videoNearDupClips(hashes, maxHamming = 3,
        maxBucketSize = Int.MaxValue, minFrac = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // brute force over every cross-clip frame pair
    val all = hashes.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val matched = for {
      (da, fa, hia, loa) <- all
      (db, _, hib, lob) <- all
      if da < db &&
        java.lang.Long.bitCount(hia ^ hib) +
          java.lang.Long.bitCount(loa ^ lob) <= 3
    } yield ((da, db), fa)
    val expect = matched.distinct.groupBy(_._1)
      .map { case (k, v) => k -> v.length.toLong }
    assert(got === expect,
      s"banding must lose nothing at hamming<=3: got=$got expect=$expect")
  }

  test("orientation, evidence bounds, cap, and strict hamming 0") {
    val hashes = hashesFor((0L until 60L).toSeq)
    val rows = Multimodal.videoNearDupClips(hashes).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "doc_a < doc_b orientation")
      assert(r.getLong(2) <= r.getLong(3),
        "matched frames bounded by doc_a's keyframes")
      assert(r.getDouble(5) >= 0.5 && r.getDouble(5) <= 1.0)
    }
    // a cap of 1 kills every bucket holding a same-seed pair -> no pairs
    assert(Multimodal.videoNearDupClips(hashes, maxBucketSize = 1)
      .collect().isEmpty)
    // hamming 0: exact fingerprint copies only — same-seed trimmed pairs
    // survive (their shared frames are pixel-identical)
    val strict = Multimodal.videoNearDupClips(hashes, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.contains((0L, 25L)) && strict.contains((1L, 26L)),
      s"exact trimmed copies must survive hamming 0: ${strict.toSeq}")
  }
}
