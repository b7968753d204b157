package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Perceptual-hash near-dup gates on constructed PNGs: identical images
  * collide exactly, a small pixel edit stays within the banded-hamming
  * guarantee (distance < 4 ⇒ a shared 16-bit band, pigeonhole), an
  * inverted image never pairs, and the prospective bucket cap silences
  * degenerate hash values instead of generating O(n²) candidates.
  */
class ImageDHashSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-image-dhash")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Encode a 9×8 grayscale PNG from an explicit pixel function. */
  private def png(px: (Int, Int) => Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 8; x <- 0 until 9) raster.setSample(x, y, 0, px(y, x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def base(r: Int, c: Int): Int = (r * 29 + c * 53) % 256

  test("dHash: identical images collide; small edit near; inversion far; pairs exact") {
    val sql = spark
    import sql.implicits._
    val rows = Seq(
      Multimodal.PngRow(1L, png(base)),                            // A
      Multimodal.PngRow(2L, png((r, c) =>                          // B: one cell forced
        if (r == 3 && c == 4) 255 else base(r, c))),               //    to 255 — flips the
                                                                   //    2 comparisons using it
      Multimodal.PngRow(3L, png((r, c) => 255 - base(r, c))),      // C: inverted
      Multimodal.PngRow(4L, png(base))                             // D: exact copy of A
    ).toDS()
    val hashes = Multimodal.dHashImages(rows).toDF()
    val h = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h(1L) == h(4L), "identical images must hash identically")
    assert(h(1L) != h(3L), "inverted image must not collide")

    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"expected {(1,2),(1,4),(2,4)}, got ${pairs.keySet}")
    assert(pairs((1L, 4L)) == 0L, "exact copy must be hamming 0")
    assert(pairs((1L, 2L)) == 2L,
      s"the forced cell feeds exactly 2 comparisons, got ${pairs((1L, 2L))}")
  }

  test("incremental: corpus via index only; ≡ full pairs minus corpus×corpus") {
    val sql = spark
    import sql.implicits._
    def shifted(k: Int): (Int, Int) => Int = (r, c) => base(r, (c + k) % 9)
    // corpus ids 100+, batch ids <100; pixel families create real near-dups
    val corpus = Seq(100L -> base _, 101L -> shifted(1), 102L -> base _)
      .map { case (id, f) => Multimodal.PngRow(id, png(f)) }.toDS()
    val batch = Seq(1L -> base _, 2L -> shifted(1), 4L -> base _,
        3L -> ((r: Int, c: Int) => 255 - base(r, c)))
      .map { case (id, f) => Multimodal.PngRow(id, png(f)) }.toDS()

    val index = Multimodal.dHashBandIndex(Multimodal.dHashImages(corpus).toDF())
    val inc = Multimodal.imageNearDupIncremental(
        index, Multimodal.dHashImages(batch).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val full = Multimodal.imageNearDupPairs(
        Multimodal.dHashImages(corpus.unionAll(batch)).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // drop corpus×corpus; orient cross pairs as (corpus, batch)
    val want = full.flatMap {
      case (a, b) if a < 100L && b < 100L  => Some((a, b))
      case (a, b) if a < 100L && b >= 100L => Some((b, a))
      case (a, b) if a >= 100L && b < 100L => Some((a, b))
      case _                               => None
    }
    assert(inc == want, s"incremental $inc != full-minus-corpus $want")
    assert(inc.contains((100L, 1L)) && inc.contains((101L, 2L)),
      "cross near-dups must surface oriented (corpus, batch)")
    assert(inc.exists { case (a, b) => a < 100L && b < 100L },
      "within-batch pairs must surface")
  }

  test("ingest: append grows the persisted index; two increments ≡ full run") {
    val sql = spark
    import sql.implicits._
    def shifted(k: Int): (Int, Int) => Int = (r, c) => base(r, (c + k) % 9)
    def hashesOf(rows: Seq[(Long, (Int, Int) => Int)]) =
      Multimodal.dHashImages(
        rows.map { case (id, f) => Multimodal.PngRow(id, png(f)) }.toDS()).toDF()
    val corpus = Seq(100L -> (base _), 101L -> shifted(1), 102L -> (base _))
    val batch1 = Seq(10L -> (base _), 11L -> shifted(1))
    val batch2 = Seq(1L -> (base _), 2L -> shifted(1),
      3L -> ((r: Int, c: Int) => 255 - base(r, c)))

    val dir = java.nio.file.Files.createTempDirectory("graft-img-ingest")
      .resolve("index").toString
    Multimodal.buildImageBandIndex(hashesOf(corpus), dir)
    val n0 = spark.read.parquet(dir).count()

    val p1 = Multimodal.imageNearDupIngest(hashesOf(batch1), dir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spark.read.parquet(dir).count() > n0,
      "append must grow the persisted index")
    // batch2 probes an index that now CONTAINS batch1 — the pairs that
    // straddle the two increments only surface if the append took
    val p2 = Multimodal.imageNearDupIngest(hashesOf(batch2), dir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2.exists { case (a, b) => Set(10L, 11L)(a) && b <= 3L },
      s"batch1-vs-batch2 pairs must come from the grown index: $p2")

    def unordered(ps: Set[(Long, Long)]): Set[Set[Long]] =
      ps.map(p => Set(p._1, p._2))
    val corpusOnly = Multimodal.imageNearDupPairs(hashesOf(corpus), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Multimodal.imageNearDupPairs(
        hashesOf(corpus ++ batch1 ++ batch2), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unordered(corpusOnly) ++ unordered(p1) ++ unordered(p2)
        === unordered(full),
      "build ∪ ingest₁ ∪ ingest₂ must cover exactly the full run's pairs")

    // append = false: probe only, the index must not grow
    val nNow = spark.read.parquet(dir).count()
    Multimodal.imageNearDupIngest(hashesOf(Seq(7L -> (base _))), dir,
      maxHamming = 3, append = false).collect()
    assert(spark.read.parquet(dir).count() === nNow,
      "append = false must leave the index untouched")
  }

  test("curateMediaClusters: one keeper per component where pairwise keeps two") {
    val sql = spark
    import sql.implicits._
    // A~C and B~C at hamming 6, but A and B are hamming 12 apart: the
    // pairwise doc_b rule keeps BOTH A and B (only C is ever a doc_b);
    // cluster-canonical keeps exactly one doc of the {A,B,C} component
    val imgs = Seq((1L, 0L, 0x3FL), (2L, 0L, 0xFC0L), (3L, 0L, 0L))
      .toDF("doc_id", "dhash_hi", "dhash_lo")
    val docs = Seq((1L, "s"), (2L, "s"), (3L, "s")).toDF("doc_id", "source")
    val auds = Seq((1L, 0x1L), (2L, 0x22L), (3L, 0x333L))
      .toDF("doc_id", "fingerprint")

    val pairwise = Multimodal.curateMedia(docs, imgs, auds)
      .collect().map(_.getLong(0)).toSet
    assert(pairwise === Set(1L, 2L),
      s"pairwise keeps the two transitively-linked survivors: $pairwise")

    val clustered = Multimodal.curateMediaClusters(docs, imgs, auds)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    assert(clustered.values.map(_._1).toSet === Set(1L),
      s"all three docs must share component 1: $clustered")
    assert(clustered.filter(_._2._2 == 1).keySet === Set(1L),
      s"exactly the canonical min-id doc survives: $clustered")
  }

  test("bucket cap: a degenerate hash shared by many images emits no pairs") {
    val sql = spark
    import sql.implicits._
    val many = (1L to 70L).map(i => Multimodal.PngRow(i, png(base))).toDS()
    val hashes = Multimodal.dHashImages(many).toDF()
    val capped = Multimodal.imageNearDupPairs(hashes, maxHamming = 3,
      maxBucketSize = 64)
    assert(capped.count() == 0L, "over-cap buckets must admit no candidates")
    val uncapped = Multimodal.imageNearDupPairs(hashes, maxHamming = 3,
      maxBucketSize = 200)
    assert(uncapped.count() == 70L * 69 / 2, "under the cap all pairs surface")
  }
}
