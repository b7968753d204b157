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

  test("incremental: cross + within pairs; unordered-pair parity with the full run") {
    val corpusIds = Seq(25L, 26L, 30L, 77L)
    val batchIds = Seq(0L, 1L, 50L, 99L) // 50 shares seed 0 with clips 0/25
    val index = Multimodal.videoBandIndex(hashesFor(corpusIds))
    val incr = Multimodal.videoNearDupIncremental(index, hashesFor(batchIds),
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))

    // cross orientation: corpus side is doc_a (frac vs the CORPUS clip's
    // keyframes, the q117 index-side convention); within-batch a < b
    incr.foreach { case (a, b, m, ka, _, frac) =>
      val isCross = corpusIds.contains(a)
      if (isCross) assert(batchIds.contains(b), s"cross pair ($a,$b)")
      else assert(a < b && batchIds.contains(b), s"within pair ($a,$b)")
      assert(m <= ka && frac <= 1.0)
    }
    // clip 25 (keyframes 0,8,16,24,32) vs trimmed batch copy 0 (0,8):
    // both of 25's first two keyframes match -> 2/5
    assert(incr.exists(p => p._1 == 25L && p._2 == 0L &&
      p._3 == 2L && p._4 == 5L && p._6 == 0.4),
      s"cross trimmed copy evidence: ${incr.toSeq}")
    // within-batch same-seed pair (0, 50)
    assert(incr.exists(p => p._1 == 0L && p._2 == 50L),
      s"within-batch pair missing: ${incr.toSeq}")

    // unordered-pair parity: (corpus-only pairs) ∪ (incremental pairs)
    // ≡ full-run pairs on the union — the corpus is never re-scanned
    // yet nothing is missed (caps non-binding, minFrac 0)
    def unordered(rows: Array[(Long, Long)]): Set[Set[Long]] =
      rows.map(p => Set(p._1, p._2)).toSet
    val corpusOnly = Multimodal.videoNearDupClips(hashesFor(corpusIds),
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = Multimodal.videoNearDupClips(hashesFor(corpusIds ++ batchIds),
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(unordered(corpusOnly) ++ unordered(incr.map(p => (p._1, p._2)))
        === unordered(full),
      "build ∪ incremental must cover exactly the full run's pair set")
  }

  test("ingest: append grows the persisted index; two increments ≡ full run") {
    val corpusIds = Seq(25L, 26L, 30L)
    val batch1Ids = Seq(0L, 1L)   // 0 shares seed 0 with clip 25
    val batch2Ids = Seq(50L, 99L) // 50 shares seed 0 with 25 AND batch1's 0

    val dir = java.nio.file.Files.createTempDirectory("graft-vid-ingest")
      .resolve("index").toString
    Multimodal.buildVideoBandIndex(hashesFor(corpusIds), dir)
    val n0 = spark.read.parquet(dir).count()

    val p1 = Multimodal.videoNearDupIngest(hashesFor(batch1Ids), dir,
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spark.read.parquet(dir).count() > n0,
      "append must grow the persisted index")
    val p2 = Multimodal.videoNearDupIngest(hashesFor(batch2Ids), dir,
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // clip 50 vs batch1's clip 0 (both seed 0) only pairs if the append
    // took — batch1 lives ONLY in the grown index
    assert(p2.exists(p => Set(p._1, p._2) == Set(0L, 50L)),
      s"cross-increment pair (0, 50) must come from the grown index: $p2")

    def unordered(ps: Set[(Long, Long)]): Set[Set[Long]] =
      ps.map(p => Set(p._1, p._2))
    val corpusOnly = Multimodal.videoNearDupClips(hashesFor(corpusIds),
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Multimodal.videoNearDupClips(
        hashesFor(corpusIds ++ batch1Ids ++ batch2Ids),
        minFrac = 0.0, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unordered(corpusOnly) ++ unordered(p1) ++ unordered(p2)
        === unordered(full),
      "build ∪ ingest₁ ∪ ingest₂ must cover exactly the full run's pairs")

    // append = false: probe only
    val nNow = spark.read.parquet(dir).count()
    Multimodal.videoNearDupIngest(hashesFor(Seq(75L)), dir, minFrac = 0.0,
      maxBucketSize = Int.MaxValue, append = false).collect()
    assert(spark.read.parquet(dir).count() === nNow,
      "append = false must leave the index untouched")
  }

  test("curateMedia video leg drops clip copies image/audio legs cannot see") {
    val sql = spark
    import sql.implicits._
    // clips 1 and 26 share seed 1 (26 % 25 == 1) — clip-level near-dups;
    // images and audio are all mutually distant, so only the video leg
    // can catch the copy
    val docs = Seq((1L, "s"), (2L, "s"), (26L, "s")).toDF("doc_id", "source")
    val imgs = Seq((1L, 0x1L, 0x2L), (2L, 0xF0F0F0F0L, 0x0F0F0F0FL),
      (26L, 0xAAAA5555L, 0x5555AAAAL)).toDF("doc_id", "dhash_hi", "dhash_lo")
    val auds = Seq((1L, 0x11L), (2L, 0x2222L), (26L, 0x333333L))
      .toDF("doc_id", "fingerprint")
    val vids = hashesFor(Seq(1L, 2L, 26L))

    val without = Multimodal.curateMedia(docs, imgs, auds)
      .collect().map(_.getLong(0)).toSet
    assert(without === Set(1L, 2L, 26L),
      s"two-modality curation must keep all three here: $without")
    val withVideo = Multimodal.curateMedia(docs, imgs, auds,
        videoFrameHashes = Some(vids))
      .collect().map(_.getLong(0)).toSet
    assert(withVideo === Set(1L, 2L),
      s"the video leg must drop the higher-id same-seed clip: $withVideo")
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
