package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QuerySpec

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns with a typed metadata struct, and per-batch decode / feature
  * extraction.
  *
  * The image path is REAL: [[withPngMedia]]/[[decodeImage]]/
  * [[resizeImageNN]] run `javax.imageio` (in the JDK — no external dep)
  * per partition, and the q94/q95 oracles gate the decoded pixels
  * row-level. Only formats with no offline JDK codec (webm, jpeg-exact)
  * keep the byte-level `decodeStub`, clearly marked. The Spark-side
  * plumbing is identical for both and is what matters at scale:
  *  - media rides as `BinaryType` next to its metadata struct (schema'd,
  *    column-prunable: a query touching only `meta` never reads the blob),
  *  - decode runs per-partition (`mapPartitions`) so a real codec would
  *    amortize native init per task, not per row,
  *  - frame sampling is a `posexplode` over a frame-index sequence —
  *    fan-out happens in the engine, not in the codec.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, format: String, width: Int,
                            height: Int, data: Array[Byte])
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
                                 byte_sum: Long, hist_0: Int, hist_1: Int,
                                 hist_2: Int, hist_3: Int)

  /** Attach a fake media payload (the doc text's bytes) + typed metadata. */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("data"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("webm")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height")).as("meta"))

  /** Flatten the media frame to the typed row the per-partition stubs
    * consume (shared so the struct layout lives in one place). */
  private def mediaRows(media: DataFrame): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"), col("data"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would invoke an image/audio codec
    * here (per partition, batched). The fake is deterministic: byte count,
    * byte sum, and a 4-bin byte histogram stand in for decoded features.
    */
  def decodeStub(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    mediaRows(media)
      .mapPartitions { rows =>
        // per-partition init site for a real codec (native lib handle, etc.)
        rows.map { m =>
          var sum = 0L
          val hist = new Array[Int](4)
          var i = 0
          while (i < m.data.length) {
            val b = m.data(i) & 0xFF
            sum += b
            hist(b >> 6) += 1
            i += 1
          }
          MediaFeatures(m.doc_id, m.format, m.data.length, sum,
            hist(0), hist(1), hist(2), hist(3))
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, format: String, width: Int,
                                height: Int, n_bytes: Int, byte_sum: Long)

  /** STUB resize: a real implementation would decode, scale to
    * (targetW, targetH) and re-encode per partition. The fake keeps the
    * plumbing honest — metadata is rewritten to the target dimensions and
    * the payload is stride-sampled (every `stride`-th byte) so output size
    * tracks the scale factor deterministically.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int,
                 stride: Int): Dataset[ResizedMedia] = {
    require(stride >= 1, s"stride must be >= 1, got $stride") // 0 = infinite loop
    val spark = media.sparkSession
    import spark.implicits._
    mediaRows(media)
      .mapPartitions { rows =>
        // per-partition init site for a real codec
        rows.map { m =>
          var sum = 0L
          var n = 0
          var i = 0
          while (i < m.data.length) {
            sum += m.data(i) & 0xFF
            n += 1
            i += stride
          }
          ResizedMedia(m.doc_id, m.format, targetW, targetH, n, sum)
        }
      }
  }

  /** Frame sampling shape: one row per sampled frame index (every `stride`
    * frames of a fake `nFrames` clip derived from payload size). Payloads
    * too small for even one frame produce NO rows — without the filter,
    * `sequence(0, -1, stride)` throws on any sub-frame-size payload
    * (Spark requires start <= stop for a positive step) where the
    * equivalent SQL `range(0, 0, stride)` simply yields nothing.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media
      .withColumn("n_frames", (octet_length(col("data")) / 16).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("meta"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as(Seq("sample_idx", "frame_idx")))
  }

  // -------------------------------------------------------------------
  // Real image codec path (javax.imageio — in the JDK, no external dep)

  final case class PngRow(doc_id: Long, data: Array[Byte])
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                                 n_pixels: Long, pixel_sum: Long,
                                 h0: Long, h1: Long, h2: Long, h3: Long)
  final case class ResizedImage(doc_id: Long, out_w: Int, out_h: Int,
                                pixel_sum: Long)

  /** Deterministic gray value of pixel (x, y) for document `id` — the
    * generative formula both the PNG fixture and the DuckDB oracle
    * share. PNG is lossless, so ImageIO decode must return exactly
    * these values; the oracle never needs to decode anything.
    */
  private def gray(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  private def dims(id: Long): (Int, Int) =
    ((id % 8 + 4).toInt, (id % 6 + 3).toInt)

  /** One REAL PNG per document: a tiny grayscale image whose pixels
    * follow [[gray]], encoded with `javax.imageio` per partition. The
    * encoded bytes are codec-dependent (zlib level etc.) and nothing
    * downstream asserts on them — all gates read DECODED pixels.
    */
  def withPngMedia(docs: DataFrame): Dataset[PngRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file spill per task
      val writer = Codecs.pngWriter() // SPI lookup once per task, not per row
      ids.map { id =>
        val (w, h) = dims(id)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gray(id, x, y)); x += 1 }
          y += 1
        }
        PngRow(id, Codecs.encodePng(writer, img))
      }
    }
  }

  /** REAL image decode: `javax.imageio` parses the PNG container and
    * inflates the pixel data per partition; features come from the
    * decoded raster, not the encoded bytes. This is the non-stub row of
    * SURVEY §2.D — [[decodeStub]] remains only for formats with no
    * offline JDK codec (webm).
    */
  def decodeImage(media: Dataset[PngRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = Codecs.pngReader() // SPI lookup once per task
      rows.map { m =>
        val img = Codecs.decodePng(reader, m.data, m.doc_id)
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = raster.getSample(x, y, 0)
            sum += g
            hist(g >> 6) += 1
            x += 1
          }
          y += 1
        }
        ImageFeatures(m.doc_id, w, h, w.toLong * h, sum,
          hist(0), hist(1), hist(2), hist(3))
      }
    }
  }

  /** REAL decode + nearest-neighbor resample to (targetW, targetH):
    * output pixel (x, y) reads source pixel (⌊x·w/tw⌋, ⌊y·h/th⌋) of the
    * ImageIO-decoded raster — the deterministic resample a SQL oracle
    * can mirror exactly, where an interpolating scaler's weights are
    * implementation-defined.
    */
  def resizeImageNN(media: Dataset[PngRow], targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    require(targetW >= 1 && targetH >= 1,
      s"resizeImageNN: target dims must be positive, got ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = Codecs.pngReader() // SPI lookup once per task
      rows.map { m =>
        val img = Codecs.decodePng(reader, m.data, m.doc_id)
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < targetH) {
          var x = 0
          while (x < targetW) {
            sum += raster.getSample(x * w / targetW, y * h / targetH, 0)
            x += 1
          }
          y += 1
        }
        ResizedImage(m.doc_id, targetW, targetH, sum)
      }
    }
  }

  final case class DHashRow(doc_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** Perceptual difference hash (dHash) of each image — the standard
    * 64-bit fingerprint image dedup pipelines run at corpus scale
    * (LAION-style near-dup pruning): decode, nearest-neighbor resample
    * to a 9×8 grayscale grid (same ⌊x·w/9⌋ mapping as [[resizeImageNN]],
    * so the DuckDB oracle recomputes the grid from the pixel formula
    * without decoding anything), then bit(r,c) = [p(r,c) < p(r,c+1)]
    * over the 8×8 horizontal comparisons. Robust to re-encoding, scale,
    * and brightness-preserving noise; the hash is emitted as two 32-bit
    * halves so neither engine touches the sign bit of a 64-bit shift.
    *
    * Scale notes: one mapPartitions pass over the media (the codec is
    * per-partition, like every decode path here); output is 3 longs per
    * image — the fingerprint table a near-dup join then works on, at
    * 24 bytes/image regardless of image size.
    */
  def dHashImages(media: Dataset[PngRow]): Dataset[DHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = Codecs.pngReader() // SPI lookup once per task
      rows.map { m =>
        val (hi, lo) = dHashOfPng(reader, m.data, m.doc_id)
        DHashRow(m.doc_id, hi, lo)
      }
    }
  }

  /** The dHash core shared by the image (q115) and video-keyframe (q133)
    * paths: ImageIO decode, 9×8 nearest-neighbor grid, 64 horizontal
    * comparisons → (hi, lo) 32-bit halves. */
  private def dHashOfPng(reader: javax.imageio.ImageReader,
                         data: Array[Byte], ctxId: Long): (Long, Long) = {
    val img = Codecs.decodePng(reader, data, ctxId)
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val grid = Array.tabulate(8, 9)((r, c) =>
      raster.getSample(c * w / 9, r * h / 8, 0))
    var hi = 0L
    var lo = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r)(c) < grid(r)(c + 1)) {
          val k = r * 8 + c
          if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
        }
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** Near-dup image pairs by banded hamming over the dHash — the same
    * architecture as SimHash text near-dup (q33): 4×16-bit bands, pairs
    * sharing ≥1 band verify exact `bit_count(xor) ≤ maxHamming`.
    * Pigeonhole: any pair within hamming distance < 4 is GUARANTEED a
    * shared band; beyond that recall is probabilistic (banding trades
    * recall for never running all-pairs). `maxBucketSize` is the same
    * prospective skew guard as the text paths — a degenerate hash value
    * shared by thousands of images must not generate O(n²) candidates.
    */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 6,
                        maxBucketSize: Int = 64): DataFrame = {
    // capByKey inside dHashBandIndex already checkpoints the banded
    // 28 B/image fingerprints — both self-join sides replay only its
    // cheap anti-join against those blocks, so the PNG mapPartitions
    // decode still runs once with no second checkpoint (r12).
    val banded = dHashBandIndex(hashes, maxBucketSize)
    hammingVerify(banded, banded, col("a.doc_id") < col("b.doc_id"), maxHamming)
  }

  /** Band the dHash table into its 4×16-bit LSH buckets and apply the
    * prospective skew cap — `(band, bval, doc_id, dhash_hi, dhash_lo)`.
    * This IS the persisted nightly artifact for the incremental path
    * (the image analogue of [[graft.operators.Dedup.tokenIndex]]): 4
    * rows × 28 B per image regardless of image size, and an index
    * stored bucketed on `(band, bval)` feeds the probe join straight
    * from its buckets with zero index-side shuffle (q81 precedent,
    * `BucketedJoinSuite`). Bands are taken from the 32-bit halves —
    * the full 64-bit word is never assembled, so every consumer
    * (including a SQL engine whose `<<` refuses to wrap) agrees.
    */
  /** The 4×16-bit band values of a 64-bit dHash carried as (hi, lo)
    * halves — THE banding every image/video consumer must agree on
    * (batch band indexes, both streaming twins, and their SQL oracles
    * mirror this exact split), so it is defined once. Order: lo-low,
    * lo-high, hi-low, hi-high. */
  private[graft] def dHashBands(hi: Column, lo: Column): Column = array(
    lo.bitwiseAND(lit(0xFFFFL)),
    shiftrightunsigned(lo, 16).bitwiseAND(lit(0xFFFFL)),
    hi.bitwiseAND(lit(0xFFFFL)),
    shiftrightunsigned(hi, 16).bitwiseAND(lit(0xFFFFL)))

  def dHashBandIndex(hashes: DataFrame, maxBucketSize: Int = 64): DataFrame =
    // skew cap via map-side count + broadcast anti-join (Dedup.capByKey),
    // not a window — a degenerate (band, bval) bucket's rows never funnel
    // through one task before being dropped
    Dedup.capByKey(
      hashes.select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
        posexplode(dHashBands(col("dhash_hi"), col("dhash_lo")))
          .as(Seq("band", "bval"))),
      Seq("band", "bval"), maxBucketSize)
      .select(col("band"), col("bval"), col("doc_id"),
        col("dhash_hi"), col("dhash_lo"))

  /** Candidate join on shared `(band, bval)` + exact hamming verify on
    * the 32-bit halves (`popcount(xor hi) + popcount(xor lo)` — equal to
    * the 64-bit hamming distance, without the 64-bit word).
    */
  private def hammingVerify(a: DataFrame, b: DataFrame, orient: Column,
                            maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"bad maxHamming $maxHamming")
    a.alias("a").join(b.alias("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          orient)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.dhash_hi").bitwiseXOR(col("b.dhash_hi"))) +
          bit_count(col("a.dhash_lo").bitwiseXOR(col("b.dhash_lo"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Incremental image near-dup: every (corpus image, batch image) and
    * (batch, batch) pair within `maxHamming` — the daily-ingest
    * counterpart of [[imageNearDupPairs]], mirroring the q74/q81 text
    * pattern. The already-ingested corpus participates ONLY through its
    * persisted [[dHashBandIndex]] (its PNGs are never re-decoded, and
    * corpus×corpus pairs — found at their own ingest — are never
    * recomputed), so daily work is ∝ batch size, not corpus size.
    * Corpus and batch doc ids are disjoint by contract (distinct ingest
    * generations). The skew cap applies per generation: the index was
    * capped at build, the batch caps within itself.
    */
  def imageNearDupIncremental(index: DataFrame, batchHashes: DataFrame,
                              maxHamming: Int = 6,
                              maxBucketSize: Int = 64): DataFrame = {
    // The probe frame is referenced three times (cross + both sides of
    // within), but dHashBandIndex's capByKey already stores the banded
    // rows — each reference replays only the cheap anti-join against
    // those blocks, so a second checkpoint here would just duplicate
    // near-identical blocks (r12: the r11 double-checkpoint removed).
    val probe = dHashBandIndex(batchHashes, maxBucketSize)
    val cross = hammingVerify(index, probe, lit(true), maxHamming)
    val within = hammingVerify(probe, probe,
      col("a.doc_id") < col("b.doc_id"), maxHamming)
    cross.unionAll(within)
  }

  /** Persist the banded fingerprint index at `dir` — the nightly build
    * step of the self-sustaining ingest loop ([[imageNearDupIngest]]
    * probes AND grows it). */
  def buildImageBandIndex(hashes: DataFrame, dir: String,
                          maxBucketSize: Int = 64): Unit =
    dHashBandIndex(hashes, maxBucketSize).write.mode("overwrite").parquet(dir)

  /** [[imageNearDupIncremental]] against the PERSISTED index at `dir`,
    * with append parity (the [[graft.operators.Dedup.semDeDupIncremental]]
    * discipline): after emitting the batch's new pairs, the batch's own
    * banded rows are appended under `dir`, so the NEXT increment probes
    * against them — nightly loops self-sustain without an index rebuild.
    * Two consecutive ingests ≡ one full run on the union corpus
    * (ImageDHashSuite gates the identity; caps apply per generation, the
    * standing incremental contract).
    *
    * Crash safety: the append is parquet `mode("append")` — new files
    * stage under the committer's hidden `_temporary/` (which readers
    * ignore) and only task-committed files are renamed in, so a crash
    * mid-append leaves the index readable with the OLD contents and no
    * torn rows; re-running the ingest is the recovery. No staged-swap
    * ([[graft.operators.Pipeline.pruneArtifact]]) is needed because
    * nothing existing is rewritten — that discipline guards REWRITES,
    * where the crash window would otherwise hold a partial copy.
    * Results materialize BEFORE the append mutates `dir` underneath the
    * lazy probe plan. */
  def imageNearDupIngest(batchHashes: DataFrame, dir: String,
                         maxHamming: Int = 6, maxBucketSize: Int = 64,
                         append: Boolean = true): DataFrame = {
    val spark = batchHashes.sparkSession
    val index = spark.read.parquet(dir)
    // capByKey inside dHashBandIndex stores the banded rows; no second
    // checkpoint (see imageNearDupIncremental)
    val probe = dHashBandIndex(batchHashes, maxBucketSize)
    val cross = hammingVerify(index, probe, lit(true), maxHamming)
    val within = hammingVerify(probe, probe,
      col("a.doc_id") < col("b.doc_id"), maxHamming)
    val out = cross.unionAll(within).localCheckpoint(true)
    if (append) probe.write.mode("append").parquet(dir)
    out
  }

  // ---------------------------------------------------------------------
  // Video keyframe near-dup: q52's frame sampling composed with q115's
  // perceptual dHash, grouped per clip — the near-dup operator for the
  // one modality whose unit of dedup (the clip) is NOT the unit of
  // fingerprinting (the frame). A clip is a sequence of frames; clips
  // sharing a content seed share frame content (the deterministic
  // stub-codec analogue of re-encoded/trimmed copies of one video), so
  // the whole path is full-oracle-able like q115/q116: keyframes are
  // REAL PNGs whose pixels follow a shared integer formula, and the
  // DuckDB oracle recomputes every fingerprint from the formula without
  // decoding anything.
  // ---------------------------------------------------------------------

  final case class FrameRow(doc_id: Long, frame_idx: Int, data: Array[Byte])
  final case class FrameHashRow(doc_id: Long, frame_idx: Int,
                                dhash_hi: Long, dhash_lo: Long)

  /** Clips sharing `doc_id % 25` share frame content — same-seed clips
    * are copies of one "master" video differing only in length
    * ([[clipFrames]]), the trimmed-copy ground truth. */
  private def clipSeed(id: Long): Long = id % 25
  private def clipFrames(id: Long): Int = (id % 40 + 10).toInt
  /** QUADRATIC in (x, y) with an f-dependent x-coefficient — deliberately
    * not a linear gradient: dHash reads horizontal ORDERING, which a
    * linear ramp keeps nearly constant across frames and seeds (a `+ f·c`
    * brightness term alone is invisible to it entirely), collapsing the
    * clip-level ground truth; the quadratic's wrap pattern separates
    * every (seed, f) pair (measured: 0 cross-frame and 0 cross-seed
    * hamming ≤ 3 collisions over all 25 seeds × 7 keyframes), so a
    * keyframe MATCH means a genuinely shared frame. */
  private def frameGray(seed: Long, f: Int, x: Int, y: Int): Int =
    ((seed * 31 + f * 101 + x * x * (7 + f % 5) + y * y * 13) % 256).toInt

  /** Frame dims larger than the single-image fixture's: a 9×8 dHash grid
    * over a 4-wide image reads only 4 distinct columns and every hash
    * degenerates toward equality. */
  private def videoDims(seed: Long): (Int, Int) =
    ((seed % 8 + 12).toInt, (seed % 6 + 9).toInt)

  /** Sample every `stride`-th frame of each clip (the q52 keyframe
    * discipline — at real scale this is the codec's I-frame walk) and
    * materialize each sampled frame as a REAL PNG. Only KEYFRAMES are
    * ever encoded or decoded — the non-sampled frames never exist,
    * which is the point of sampling before fingerprinting.
    */
  def withVideoKeyframes(docs: DataFrame, stride: Int = 8): Dataset[FrameRow] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = Codecs.pngWriter() // SPI lookup once per task
      // same-(seed, f) frames are byte-identical across clips (trimmed
      // copies of one master) — encode each once per partition; the
      // DOWNSTREAM decode+fingerprint work stays honestly per-clip-frame
      val memo = collection.mutable.HashMap.empty[(Long, Int), Array[Byte]]
      ids.flatMap { id =>
        val seed = clipSeed(id)
        val (w, h) = videoDims(seed)
        (0 until clipFrames(id) by stride).iterator.map { f =>
          val bytes = memo.getOrElseUpdate((seed, f), {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, frameGray(seed, f, x, y)); x += 1
              }
              y += 1
            }
            Codecs.encodePng(writer, img)
          })
          FrameRow(id, f, bytes)
        }
      }
    }
  }

  /** Per-keyframe perceptual dHash — [[dHashImages]] keyed by
    * (clip, frame): one mapPartitions decode pass, 28 B of fingerprint
    * per frame regardless of frame size.
    */
  def dHashFrames(frames: Dataset[FrameRow]): Dataset[FrameHashRow] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = Codecs.pngReader() // SPI lookup once per task
      rows.map { m =>
        val (hi, lo) = dHashOfPng(reader, m.data, m.doc_id)
        FrameHashRow(m.doc_id, m.frame_idx, hi, lo)
      }
    }
  }

  /** Near-dup CLIP pairs from keyframe fingerprints: candidate frame
    * pairs come from the same 4×16-bit banded-hamming generation as the
    * image path (never all-pairs of frames — shared band or no
    * candidacy, degenerate buckets capped), each survives the exact
    * `hamming ≤ maxHamming` verify, and clip-pair similarity is the
    * fraction of `doc_a`'s keyframes with a matching keyframe in
    * `doc_b`. Pairs with `match_frac ≥ minFrac` are emitted with their
    * evidence counts.
    *
    * The default `maxHamming = 3` keeps the banding LOSSLESS by
    * pigeonhole (4 bands, ≤ 3 differing bits ⇒ some band matches), so
    * the operator is exactly the all-pairs formulation it replaces —
    * recall 1 at a fraction of the candidates (modulo the bucket cap,
    * which the oracle mirrors).
    *
    * Scale shape: clips never travel — only (band, bval, clip, frame,
    * hi, lo) fingerprint rows reach the self-join, checkpointed so the
    * keyframe decode runs once (the q116 decode-once discipline); the
    * per-clip keyframe counts are a |clips|-row aggregate broadcast
    * back; the final pair aggregation is keyed by the (already small)
    * matched-pair set.
    */
  def videoNearDupClips(frameHashes: DataFrame, maxHamming: Int = 3,
                        maxBucketSize: Int = 64,
                        minFrac: Double = 0.5): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"bad maxHamming $maxHamming")
    require(minFrac >= 0.0 && minFrac <= 1.0, s"bad minFrac $minFrac")
    // band-once via capByKey's internal checkpoint: both self-join
    // sides replay only its anti-join, never the explode subtree (r12:
    // the redundant outer checkpoint removed)
    val banded = videoBandIndex(frameHashes, maxBucketSize)
    clipPairs(banded, banded, col("a.doc_id") < col("b.doc_id"),
      maxHamming, minFrac)
  }

  /** Band a keyframe-fingerprint table into its 4×16-bit buckets with
    * the prospective cap, each row carrying its clip's PRE-cap keyframe
    * count — `(band, bval, doc_id, frame_idx, dhash_hi, dhash_lo,
    * n_key)`. This is ALSO the persisted nightly artifact for the
    * incremental path (the video analogue of
    * [[graft.operators.Dedup.tokenIndex]]'s `n_tok` rider: the
    * denominator travels with the fingerprint, so probing needs no join
    * back to the corpus frames). The n_key rider is computed before the
    * cap — a frame whose bucket was capped still counts toward its
    * clip's denominator (the cap prunes candidacy, not existence).
    */
  def videoBandIndex(frameHashes: DataFrame,
                     maxBucketSize: Int = 64): DataFrame = {
    // decode-once: the 24 B/frame fingerprints are checkpointed before
    // the per-clip count aggregate and the banding each read them
    val hashes = frameHashes.select(col("doc_id"), col("frame_idx"),
        col("dhash_hi"), col("dhash_lo"))
      .localCheckpoint(false)
    val nKeys = hashes.groupBy(col("doc_id")).agg(count(lit(1)).as("n_key"))
    // skew cap via map-side count + broadcast anti-join (Dedup.capByKey),
    // not a window — a degenerate (band, bval) bucket never funnels
    // through one task before being dropped
    Dedup.capByKey(
      hashes.join(broadcast(nKeys), "doc_id")
        .select(col("doc_id"), col("frame_idx"), col("dhash_hi"),
          col("dhash_lo"), col("n_key"),
          posexplode(dHashBands(col("dhash_hi"), col("dhash_lo")))
            .as(Seq("band", "bval"))),
      Seq("band", "bval"), maxBucketSize)
      .select(col("band"), col("bval"), col("doc_id"), col("frame_idx"),
        col("dhash_hi"), col("dhash_lo"), col("n_key"))
  }

  /** Candidate join on shared `(band, bval)` + exact hamming verify +
    * per-clip-pair aggregation — shared by the inline self-join (q133)
    * and the incremental probe (q135). `n_key_a`/`n_key_b` ride the
    * banded rows, so no join back to per-clip counts is needed.
    */
  private def clipPairs(a: DataFrame, b: DataFrame, orient: Column,
                        maxHamming: Int, minFrac: Double): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"bad maxHamming $maxHamming")
    require(minFrac >= 0.0 && minFrac <= 1.0, s"bad minFrac $minFrac")
    a.alias("a").join(b.alias("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          orient)
      .filter(
        (bit_count(col("a.dhash_hi").bitwiseXOR(col("b.dhash_hi"))) +
          bit_count(col("a.dhash_lo").bitwiseXOR(col("b.dhash_lo"))))
          <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("a.frame_idx").as("frame_a"),
        col("a.n_key").as("n_key_a"),
        col("b.doc_id").as("doc_b"), col("b.n_key").as("n_key_b"))
      .dropDuplicates("doc_a", "frame_a", "doc_b")
      .groupBy(col("doc_a"), col("doc_b"), col("n_key_a"), col("n_key_b"))
      .agg(count(lit(1)).as("n_matched"))
      .withColumn("match_frac",
        round(col("n_matched").cast("double") / col("n_key_a"), 6))
      .filter(col("match_frac") >= minFrac)
      .select(col("doc_a"), col("doc_b"), col("n_matched"),
        col("n_key_a"), col("n_key_b"), col("match_frac"))
  }

  /** Incremental video near-dup: every (corpus clip, batch clip) and
    * (batch, batch) pair whose matched-keyframe fraction reaches
    * `minFrac` — the daily-ingest counterpart of [[videoNearDupClips]],
    * completing the incremental family across modalities (text q81,
    * image q117, semantic q134). The already-ingested corpus
    * participates ONLY through its persisted [[videoBandIndex]] (its
    * keyframes are never re-decoded, and corpus×corpus pairs — found at
    * their own ingest — are never recomputed), so daily work is ∝ batch
    * size. Cross pairs orient (corpus, batch) with the fraction
    * denominated by the CORPUS clip's keyframes (the index side is
    * `doc_a`, the q117 orientation); within-batch pairs orient
    * `doc_a < doc_b`. Corpus and batch clip ids are disjoint by
    * contract. The skew cap applies per generation: the index was
    * capped at build, the batch caps within itself.
    */
  def videoNearDupIncremental(index: DataFrame, batchHashes: DataFrame,
                              maxHamming: Int = 3, maxBucketSize: Int = 64,
                              minFrac: Double = 0.5): DataFrame = {
    // the probe is referenced three times (cross + both within sides)
    val probe = videoBandIndex(batchHashes, maxBucketSize)
      .localCheckpoint(false)
    val cross = clipPairs(index, probe, lit(true), maxHamming, minFrac)
    val within = clipPairs(probe, probe,
      col("a.doc_id") < col("b.doc_id"), maxHamming, minFrac)
    cross.unionByName(within)
  }

  /** Persist the banded keyframe index at `dir` — the nightly build step
    * of the self-sustaining video ingest loop ([[videoNearDupIngest]]
    * probes AND grows it). */
  def buildVideoBandIndex(frameHashes: DataFrame, dir: String,
                          maxBucketSize: Int = 64): Unit =
    videoBandIndex(frameHashes, maxBucketSize).write.mode("overwrite").parquet(dir)

  /** [[videoNearDupIncremental]] against the PERSISTED index at `dir`,
    * with append parity ([[graft.operators.Dedup.semDeDupIncremental]]'s
    * discipline, [[imageNearDupIngest]]'s image twin): new clip pairs
    * are emitted, then the batch's banded keyframe rows (n_key riders
    * included — per-clip denominators, unaffected by other generations)
    * are appended under `dir` so the next increment probes against
    * them. Two consecutive ingests ≡ one full run on the union corpus
    * (VideoNearDupSuite gates the identity). Crash safety: see
    * [[imageNearDupIngest]] — append-only parquet stages under the
    * committer's hidden `_temporary/`, a crash leaves the old index
    * readable and the rerun is the recovery; no staged-swap needed
    * because nothing existing is rewritten. */
  def videoNearDupIngest(batchHashes: DataFrame, dir: String,
                         maxHamming: Int = 3, maxBucketSize: Int = 64,
                         minFrac: Double = 0.5,
                         append: Boolean = true): DataFrame = {
    val spark = batchHashes.sparkSession
    val index = spark.read.parquet(dir)
    val probe = videoBandIndex(batchHashes, maxBucketSize)
      .localCheckpoint(false)
    val cross = clipPairs(index, probe, lit(true), maxHamming, minFrac)
    val within = clipPairs(probe, probe,
      col("a.doc_id") < col("b.doc_id"), maxHamming, minFrac)
    val out = cross.unionByName(within).localCheckpoint(true)
    if (append) probe.write.mode("append").parquet(dir)
    out
  }

  // ---------------------------------------------------------------------
  // REAL audio path: 16-bit mono PCM WAV through `javax.sound.sampled`
  // (in the JDK — no external dep). Mirrors the PNG path's design: the
  // synthetic waveform follows a shared integer formula ([[sample]]), WAV
  // PCM is lossless, so the decode must return exactly those samples and
  // the DuckDB oracle recomputes the formula instead of decoding anything.
  // Re-expresses the reference's audio-decode surface (SURVEY §2.D) —
  // the container parse + frame read is real; only perceptual codecs
  // (mp3/ogg) stay stubbed, there is no offline JDK codec for them.
  // ---------------------------------------------------------------------

  final case class WavRow(doc_id: Long, data: Array[Byte])
  final case class AudioFeatures(doc_id: Long, n_samples: Long, sum_val: Long,
                                 sum_abs: Long, zero_cross: Long, peak: Long)
  final case class ResampledAudio(doc_id: Long, target_n: Int, sum_val: Long)

  /** Deterministic 16-bit sample `i` of doc `id` — the generative formula
    * the WAV fixture and the DuckDB oracle share. The ×787 stride wraps
    * the 4096-wide ramp every ~5 samples so zero-crossing counts are
    * non-degenerate.
    */
  private def sample(id: Long, i: Int): Int =
    ((id * 131 + i * 787L) % 4096 - 2048).toInt

  private def numSamples(id: Long): Int = (id % 50 + 30).toInt

  private val WavFormat =
    new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false) // s16le mono

  /** One REAL RIFF/WAVE blob per document: [[sample]] values packed as
    * little-endian s16 PCM and containerized by `AudioSystem.write` per
    * partition. Nothing downstream asserts on the container bytes — all
    * gates read DECODED samples.
    */
  def withWavMedia(docs: DataFrame): Dataset[WavRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val writer = Codecs.wavWriter() // SPI lookup once per task, not per row
      ids.map { id =>
        val n = numSamples(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = sample(id, i)
          pcm(2 * i) = (s & 0xFF).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), WavFormat, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        WavRow(id, out.toByteArray)
      }
    }
  }

  /** Decode a WAV blob to its s16 samples via `AudioSystem` (header parse
    * + frame read — the real container path, shared by decode/resample).
    */
  private def readWavSamples(readers: Array[javax.sound.sampled.spi.AudioFileReader],
                             data: Array[Byte], docId: Long): Array[Int] = {
    val in = Codecs.openWav(readers, data)
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
        s"unexpected WAV format for doc $docId: $fmt")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      out
    } finally in.close()
  }

  /** REAL audio decode + per-clip features: sample count, sum, absolute
    * energy, zero crossings (sign flips between adjacent samples), and
    * peak amplitude — all integer arithmetic over the decoded PCM, so the
    * oracle comparison is exact, never float-tolerance.
    */
  def decodeAudio(media: Dataset[WavRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val readers = Codecs.wavReaders() // SPI lookup once per task
      rows.map { m =>
        val s = readWavSamples(readers, m.data, m.doc_id)
        var sum = 0L; var sumAbs = 0L; var zc = 0L; var peak = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i)
          sum += v
          sumAbs += math.abs(v)
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        AudioFeatures(m.doc_id, s.length.toLong, sum, sumAbs, zc, peak)
      }
    }
  }

  /** REAL decode + nearest-neighbor resample to `targetN` samples: output
    * sample `i` reads decoded sample `⌊i·n/targetN⌋` — the deterministic
    * resample a SQL oracle mirrors exactly, where a windowed-sinc
    * resampler's taps are implementation-defined.
    */
  def resampleAudioNN(media: Dataset[WavRow], targetN: Int): Dataset[ResampledAudio] = {
    require(targetN >= 1, s"resampleAudioNN: targetN must be positive, got $targetN")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val readers = Codecs.wavReaders() // SPI lookup once per task
      rows.map { m =>
        val s = readWavSamples(readers, m.data, m.doc_id)
        var sum = 0L
        var i = 0
        while (i < targetN) {
          sum += s((i.toLong * s.length / targetN).toInt)
          i += 1
        }
        ResampledAudio(m.doc_id, targetN, sum)
      }
    }
  }

  final case class AudioFingerprintRow(doc_id: Long, n_samples: Long,
                                       fingerprint: Long)

  /** Perceptual audio fingerprint — the audio twin of [[dHashImages]]:
    * decode, bucket the clip into 33 energy frames (frame of sample `i`
    * is `⌊i·33/n⌋`, the same monotone mapping as [[resampleAudioNN]], so
    * the oracle re-derives it without decoding), then
    * bit(f) = [E(f) > E(f+1)] over the 32 adjacent-frame comparisons —
    * the sign-of-energy-difference envelope shape that survives volume-
    * preserving re-encodes and container changes. Frames a short clip
    * leaves empty contribute energy 0, deterministically on both
    * engines. Entirely integer arithmetic; the 32-bit word never touches
    * a sign bit. One mapPartitions pass, 24 B/clip out regardless of
    * clip length — the fingerprint table downstream dedup works on.
    */
  def audioFingerprint(media: Dataset[WavRow]): Dataset[AudioFingerprintRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val readers = Codecs.wavReaders() // SPI lookup once per task
      rows.map { m =>
        val s = readWavSamples(readers, m.data, m.doc_id)
        val n = s.length
        require(n > 0, s"empty clip for doc ${m.doc_id}")
        val e = new Array[Long](33)
        var i = 0
        // Long math on the frame index: `i * 33` overflows Int past ~65 M
        // samples (~24 min at 44.1 kHz) — same guard as [[resampleAudioNN]].
        while (i < n) { e((i.toLong * 33 / n).toInt) += math.abs(s(i)); i += 1 }
        var fp = 0L
        var f = 0
        while (f < 32) { if (e(f) > e(f + 1)) fp |= (1L << f); f += 1 }
        AudioFingerprintRow(m.doc_id, n.toLong, fp)
      }
    }
  }

  /** Perceptual audio dedup: group clips by exact [[audioFingerprint]]
    * match (the acoustid-style exact-fingerprint join), keep groups of
    * ≥ 2 with a canonical member. One partial-aggregated shuffle over
    * 24 B/clip rows — the clips themselves never move.
    */
  def audioDedupGroups(fingerprints: DataFrame): DataFrame =
    fingerprints.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_copies") >= 2)

  /** Near-dup audio pairs by banded hamming over the 32-bit envelope
    * fingerprint — the audio analogue of [[imageNearDupPairs]] and the
    * GRADED companion to [[audioDedupGroups]]'s exact-match join: a
    * volume-tweaked re-encode whose quietest frame flips one
    * energy comparison escapes the exact join entirely but sits at
    * hamming 1–2 here. 4×8-bit bands over the fingerprint word, so by
    * pigeonhole any pair within hamming ≤ 3 is GUARANTEED a shared band
    * (the default is lossless, like the video path); `maxBucketSize` is
    * the usual prospective skew guard. Only (band, bval, doc_id,
    * fingerprint) rows — 20 B/clip — ride the self-join; clips never
    * travel.
    */
  /** The 4×8-bit band values of a 32-bit audio fingerprint — THE
    * banding every audio consumer must agree on (the batch near-dup,
    * the streaming twin, and the q136 SQL oracle mirror this exact
    * split), so it is defined once. Order: low byte first. */
  private[graft] def audioBands(fp: Column): Column = array(
    fp.bitwiseAND(lit(0xFFL)),
    shiftrightunsigned(fp, 8).bitwiseAND(lit(0xFFL)),
    shiftrightunsigned(fp, 16).bitwiseAND(lit(0xFFL)),
    shiftrightunsigned(fp, 24).bitwiseAND(lit(0xFFL)))

  def audioNearDupPairs(fingerprints: DataFrame, maxHamming: Int = 3,
                        maxBucketSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 32, s"bad maxHamming $maxHamming")
    // decode-once: both self-join sides read capByKey's checkpointed
    // 20 B/band-row cut, not the WAV mapPartitions decode subtree; the
    // skew cap is a map-side count + broadcast anti-join, not a window
    val banded = Dedup.capByKey(
      fingerprints.select(col("doc_id"), col("fingerprint"),
        posexplode(audioBands(col("fingerprint")))
          .as(Seq("band", "bval"))),
      Seq("band", "bval"), maxBucketSize)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fingerprint").bitwiseXOR(col("b.fingerprint")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Build-once memo for the q135 harness query ([[BuildOnce]]): the
    * banded keyframe index of the corpus generation (doc_id >= 250),
    * persisted to parquet once per sf-dir per JVM. Library users call
    * [[videoBandIndex]] + `.write.parquet` with their own storage.
    */
  private def cachedVideoBandIndex(s: SparkSession, d: String): String =
    BuildOnce.dir("graft-video-index", d) { dir =>
      videoBandIndex(dHashFrames(withVideoKeyframes(
          Tables.documents(s, d).filter(col("doc_id") >= 250))).toDF())
        .write.parquet(s"$dir/index")
      s"$dir/index"
    }

  /** Cross-modal media curation — the q70-style composition for media:
    * drop every doc whose IMAGE has a perceptual near-dup with a lower
    * id ([[imageNearDupPairs]] orients `doc_a < doc_b`, so distinct
    * `doc_b` IS the loser set) and every doc whose AUDIO shares an exact
    * [[audioFingerprint]] with an earlier doc (group-min canonical).
    * What survives carried media that is perceptually fresh in both
    * modalities.
    *
    * Scale shape: both loser sets are fingerprint-sized (24-28 B rows,
    * never media bytes), shrink further under distinct, and anti-join
    * the corpus by key — AQE broadcasts them in practice. The media
    * decode passes run once each; the corpus scan itself is never
    * replicated per modality.
    */
  /** @param videoFrameHashes keyframe fingerprints ([[dHashFrames]]
    *        output) for the VIDEO leg (r10): a doc also loses when its
    *        clip has a keyframe-level near-dup with a lower-id clip
    *        ([[videoNearDupClips]] orients `doc_a < doc_b`, so distinct
    *        `doc_b` is the loser set — the same pairwise min-id
    *        convention as the image leg; route the pair set through
    *        [[graft.operators.Dedup.dedupClusters]] instead when
    *        cluster-canonical retention over transitive chains is
    *        wanted). `None` = two-modality curation (q123's shape). */
  def curateMedia(docs: DataFrame, imageHashes: DataFrame,
                  audioFps: DataFrame, maxHamming: Int = 6,
                  maxBucketSize: Int = 64,
                  videoFrameHashes: Option[DataFrame] = None,
                  videoMaxHamming: Int = 3,
                  videoMinFrac: Double = 0.5): DataFrame = {
    val imgLosers = imageNearDupPairs(imageHashes, maxHamming, maxBucketSize)
      .select(col("doc_b").as("doc_id"))
    // audioFps feeds both the group-min and the probe side of its
    // self-join; checkpoint the 24 B/clip fingerprints so the WAV decode
    // runs once. (The image leg is already checkpointed inside
    // [[imageNearDupPairs]]; the video leg inside [[videoNearDupClips]].)
    val fps = audioFps.localCheckpoint(false)
    val audLosers = fps
      .join(fps.groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("__canonical")), "fingerprint")
      .filter(col("doc_id") =!= col("__canonical"))
      .select(col("doc_id"))
    val losers = videoFrameHashes.fold(imgLosers.unionAll(audLosers)) { vf =>
      val vidLosers = videoNearDupClips(vf, videoMaxHamming, maxBucketSize,
          videoMinFrac)
        .select(col("doc_b").as("doc_id"))
      imgLosers.unionAll(audLosers).unionAll(vidLosers)
    }
    docs.join(losers.distinct(), Seq("doc_id"), "left_anti")
  }

  /** The undirected cross-modal near-dup PAIR set feeding
    * [[curateMediaClusters]]: image banded-hamming pairs ∪ audio
    * exact-fingerprint star edges (each group member linked to its group
    * minimum — CC-equivalent to the within-group clique at |group|−1
    * edges instead of |group|²/2) ∪ clip-level video keyframe pairs.
    * Only fingerprint-sized (doc_a, doc_b) rows — media bytes never
    * ride the edge list. */
  def mediaPairs(imageHashes: DataFrame, audioFps: DataFrame,
                 videoFrameHashes: Option[DataFrame] = None,
                 maxHamming: Int = 6, maxBucketSize: Int = 64,
                 videoMaxHamming: Int = 3,
                 videoMinFrac: Double = 0.5): DataFrame = {
    val img = imageNearDupPairs(imageHashes, maxHamming, maxBucketSize)
      .select(col("doc_a"), col("doc_b"))
    val fps = audioFps.localCheckpoint(false)
    val aud = fps
      .join(fps.groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("__canonical")), "fingerprint")
      .filter(col("doc_id") =!= col("__canonical"))
      .select(col("__canonical").as("doc_a"), col("doc_id").as("doc_b"))
    val base = img.unionAll(aud)
    videoFrameHashes.fold(base)(vf => base.unionAll(
      videoNearDupClips(vf, videoMaxHamming, maxBucketSize, videoMinFrac)
        .select(col("doc_a"), col("doc_b"))))
  }

  /** CLUSTER-CANONICAL cross-modal curation — the alternative
    * [[curateMedia]]'s doc comment names: instead of pairwise doc_b
    * losers (where two docs that only share a transitive neighbor can
    * BOTH survive), the full media pair set routes through
    * [[graft.operators.Dedup.dedupClusters]] (q49's O(log n)
    * connected components), so exactly ONE doc survives per connected
    * cross-modal component — an image near-dup of a video near-dup of
    * an audio copy all collapse to one canonical keeper. Returns docs
    * annotated with `comp` (canonical doc_id of the component) and
    * `retained` (1 iff canonical); filter `retained = 1` to curate.
    *
    * Scale shape: the edge list is fingerprint-derived (20-28 B rows),
    * the CC rounds move only (long, long) pairs, and the final label
    * join is id-keyed — media bytes never shuffle anywhere.
    */
  def curateMediaClusters(docs: DataFrame, imageHashes: DataFrame,
                          audioFps: DataFrame,
                          videoFrameHashes: Option[DataFrame] = None,
                          maxHamming: Int = 6, maxBucketSize: Int = 64,
                          videoMaxHamming: Int = 3,
                          videoMinFrac: Double = 0.5): DataFrame =
    graft.operators.Dedup.dedupClusters(docs,
      mediaPairs(imageHashes, audioFps, videoFrameHashes,
        maxHamming, maxBucketSize, videoMaxHamming, videoMinFrac))

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q50_media_meta",
      (s, d) => {
        import s.implicits._
        withMedia(Tables.documents(s, d))
          .groupBy($"meta.format".as("format"))
          .agg(count(lit(1)).as("n_media"),
               sum(octet_length($"data")).as("sum_bytes"),
               sum($"meta.width".cast("long") * $"meta.height").as("sum_pixels"))
          .orderBy($"format")
      },
      Some("""
        SELECT format, COUNT(*) AS n_media,
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS sum_bytes,
               CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS sum_pixels
        FROM (
          SELECT text,
                 ['png','jpeg','webm'][CAST(doc_id % 3 + 1 AS INT)] AS format,
                 CAST(doc_id % 640 + 64 AS INT) AS width,
                 CAST(doc_id % 480 + 48 AS INT) AS height
          FROM documents)
        GROUP BY format
        ORDER BY format""")),

    QuerySpec(
      "q51_media_decode",
      (s, d) => decodeStub(withMedia(Tables.documents(s, d)))
        .toDF()
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"), sum(col("byte_sum")).as("total_byte_sum"),
             sum(col("hist_0")).as("h0"), sum(col("hist_1")).as("h1"),
             sum(col("hist_2")).as("h2"), sum(col("hist_3")).as("h3"))
        .orderBy(col("format")),
      // byte-level recompute of the stub's features in SQL. NOTE: the
      // oracle iterates CHARS (ascii/substr) while the operator iterates
      // UTF-8 BYTES — equivalent only because the fixture corpus is pure
      // ASCII (verified); DuckDB has no blob byte accessor to express the
      // byte-exact form.
      Some("""
        SELECT format, COUNT(*) AS n,
               CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum,
               CAST(SUM(h0) AS BIGINT) AS h0, CAST(SUM(h1) AS BIGINT) AS h1,
               CAST(SUM(h2) AS BIGINT) AS h2, CAST(SUM(h3) AS BIGINT) AS h3
        FROM (
          SELECT ['png','jpeg','webm'][CAST(doc_id % 3 + 1 AS INT)] AS format,
                 list_sum(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1)))) AS byte_sum,
                 len(list_filter(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))), b -> b // 64 = 0)) AS h0,
                 len(list_filter(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))), b -> b // 64 = 1)) AS h1,
                 len(list_filter(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))), b -> b // 64 = 2)) AS h2,
                 len(list_filter(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))), b -> b // 64 = 3)) AS h3
          FROM documents)
        GROUP BY format
        ORDER BY format""")),

    QuerySpec(
      "q53_media_resize",
      (s, d) => resizeStub(withMedia(Tables.documents(s, d)), 224, 224, 4)
        .toDF()
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
             max(col("width")).as("out_w"), max(col("height")).as("out_h"),
             sum(col("n_bytes")).cast("long").as("sum_bytes"),
             sum(col("byte_sum")).cast("long").as("sum_sampled"))
        .orderBy(col("format")),
      // byte-level recompute of the stride sampling in SQL (same ASCII
      // caveat as q51)
      Some("""
        SELECT format, COUNT(*) AS n,
               224 AS out_w, 224 AS out_h,
               CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
               CAST(SUM(byte_sum) AS BIGINT) AS sum_sampled
        FROM (
          SELECT ['png','jpeg','webm'][CAST(doc_id % 3 + 1 AS INT)] AS format,
                 len(list_filter(range(1, length(text) + 1), i -> (i - 1) % 4 = 0)) AS n_bytes,
                 list_sum(list_transform(
                   list_filter(range(1, length(text) + 1), i -> (i - 1) % 4 = 0),
                   i -> ascii(substr(text, CAST(i AS INT), 1)))) AS byte_sum
          FROM documents)
        GROUP BY format
        ORDER BY format""")),

    // REAL codec round-trip gate: encode (ImageIO png writer) → decode
    // (ImageIO reader) → features from the DECODED raster, row-level
    // against the generative pixel formula recomputed in pure SQL. Any
    // codec-path defect (stride, channel order, premature truncation)
    // breaks the pixel sums.
    QuerySpec(
      "q94_media_decode_real",
      (s, d) => decodeImage(withPngMedia(Tables.documents(s, d)))
        .toDF().orderBy(col("doc_id")),
      Some("""
        WITH px AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h
          FROM documents),
        g AS (
          SELECT doc_id, w, h,
                 (doc_id*31 + xs.x*7 + ys.y*13) % 256 AS gray
          FROM px, LATERAL unnest(range(0, w)) AS xs(x),
                   LATERAL unnest(range(0, h)) AS ys(y))
        SELECT doc_id, CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
               COUNT(*) AS n_pixels, CAST(SUM(gray) AS BIGINT) AS pixel_sum,
               CAST(COUNT(*) FILTER (WHERE gray // 64 = 0) AS BIGINT) AS h0,
               CAST(COUNT(*) FILTER (WHERE gray // 64 = 1) AS BIGINT) AS h1,
               CAST(COUNT(*) FILTER (WHERE gray // 64 = 2) AS BIGINT) AS h2,
               CAST(COUNT(*) FILTER (WHERE gray // 64 = 3) AS BIGINT) AS h3
        FROM g GROUP BY doc_id ORDER BY doc_id""")),

    // Perceptual dHash over the REAL decode path: the oracle recomputes
    // the 9x8 NN-resampled grid and all 64 comparison bits from the
    // shared pixel formula — bit-exact, no decoding in DuckDB.
    QuerySpec(
      "q115_image_dhash",
      (s, d) => dHashImages(withPngMedia(Tables.documents(s, d)))
        .toDF().orderBy(col("doc_id")),
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h
          FROM documents),
        cells AS (
          SELECT i.doc_id, r.range AS r, c.range AS c,
                 (i.doc_id*31 + ((c.range*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS g,
                 (i.doc_id*31 + (((c.range+1)*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS gn
          FROM ids i CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        bits AS (SELECT doc_id, r*8 + c AS k,
                        CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                 FROM cells)
        SELECT doc_id,
               CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                    AS BIGINT) AS dhash_hi,
               CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                    AS BIGINT) AS dhash_lo
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // Banded-hamming image near-dup over the dHash table: fully
    // deterministic (bands, cap, threshold), so the whole candidate
    // topology is oracle-checkable. DuckDB never assembles the 64-bit
    // hash (its `<<` raises on overflow): bands and hamming both work
    // on the 32-bit halves, which is bit-identical.
    QuerySpec(
      "q116_image_neardup",
      (s, d) => imageNearDupPairs(
          dHashImages(withPngMedia(Tables.documents(s, d))).toDF())
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h
          FROM documents),
        cells AS (
          SELECT i.doc_id, r.range AS r, c.range AS c,
                 (i.doc_id*31 + ((c.range*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS g,
                 (i.doc_id*31 + (((c.range+1)*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS gn
          FROM ids i CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        bits AS (SELECT doc_id, r*8 + c AS k,
                        CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                 FROM cells),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM bits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
                    AS BIGINT) AS hamming
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
        ORDER BY doc_a, doc_b""")),

    // Incremental image near-dup: corpus rides only its persisted band
    // index (q74/q81 pattern); the oracle re-derives BOTH generations'
    // banded buckets (cap per generation) and the exact union the two
    // probe joins produce.
    QuerySpec(
      "q117_image_neardup_incr",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val index = dHashBandIndex(
          dHashImages(withPngMedia(docs.filter(col("doc_id") >= 250))).toDF())
        imageNearDupIncremental(index,
            dHashImages(withPngMedia(docs.filter(col("doc_id") < 250))).toDF())
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h
          FROM documents),
        cells AS (
          SELECT i.doc_id, r.range AS r, c.range AS c,
                 (i.doc_id*31 + ((c.range*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS g,
                 (i.doc_id*31 + (((c.range+1)*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS gn
          FROM ids i CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        bits AS (SELECT doc_id, r*8 + c AS k,
                        CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                 FROM cells),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM bits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, hi, lo, doc_id < 250 AS is_new, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY is_new, band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
                    AS BIGINT) AS hamming
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.bval = b.bval AND b.is_new
         AND (NOT a.is_new OR a.doc_id < b.doc_id)
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
        ORDER BY doc_a, doc_b""")),

    // Video keyframe near-dup: q52's frame sampling + q115's dHash,
    // grouped per clip — clip-pair similarity = fraction of doc_a's
    // keyframes with a banded-hamming match in doc_b (never all-pairs
    // of frames). Same-seed clips (doc_id % 25) are trimmed copies of
    // one master video, so overlap fractions are nontrivial. The
    // oracle recomputes every keyframe fingerprint from the shared
    // pixel formula (q116 discipline) and mirrors the banding + cap.
    QuerySpec(
      "q133_video_keyframe_neardup",
      (s, d) => videoNearDupClips(
          dHashFrames(withVideoKeyframes(Tables.documents(s, d))).toDF())
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH ids AS (
          SELECT doc_id,
                 CAST(doc_id % 25 AS BIGINT) AS seed,
                 CAST(doc_id % 40 + 10 AS BIGINT) AS nf
          FROM documents),
        dims AS (
          SELECT doc_id, seed, nf,
                 CAST(seed % 8 + 12 AS BIGINT) AS w,
                 CAST(seed % 6 + 9 AS BIGINT) AS h
          FROM ids),
        frames AS (
          SELECT d.doc_id, d.seed, d.w, d.h, f.range AS f
          FROM dims d CROSS JOIN range(0, 50) f
          WHERE f.range % 8 = 0 AND f.range < d.nf),
        cells AS (
          SELECT fr.doc_id, fr.f, r.range AS r, c.range AS c,
                 (fr.seed*31 + fr.f*101
                  + ((c.range*fr.w)//9)*((c.range*fr.w)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.h)//8)*((r.range*fr.h)//8)*13) % 256 AS g,
                 (fr.seed*31 + fr.f*101
                  + (((c.range+1)*fr.w)//9)*(((c.range+1)*fr.w)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.h)//8)*((r.range*fr.h)//8)*13) % 256 AS gn
          FROM frames fr CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        bits AS (SELECT doc_id, f, r*8 + c AS k,
                        CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                 FROM cells),
        hashes AS (
          SELECT doc_id, f,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM bits GROUP BY doc_id, f),
        nkeys AS (SELECT doc_id, COUNT(*) AS n_key FROM hashes GROUP BY doc_id),
        banded AS (
          SELECT doc_id, f, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64),
        matched AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.f AS frame_a, b.doc_id AS doc_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        pairs AS (
          SELECT doc_a, doc_b, COUNT(*) AS n_matched
          FROM matched GROUP BY doc_a, doc_b)
        SELECT p.doc_a, p.doc_b, CAST(p.n_matched AS BIGINT) AS n_matched,
               CAST(ka.n_key AS BIGINT) AS n_key_a,
               CAST(kb.n_key AS BIGINT) AS n_key_b,
               ROUND(CAST(p.n_matched AS DOUBLE) / ka.n_key, 6) AS match_frac
        FROM pairs p
        JOIN nkeys ka ON ka.doc_id = p.doc_a
        JOIN nkeys kb ON kb.doc_id = p.doc_b
        WHERE ROUND(CAST(p.n_matched AS DOUBLE) / ka.n_key, 6) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // Incremental video near-dup: the corpus participates only through
    // its persisted banded keyframe index (q74/q81/q117/q134 pattern —
    // work ∝ batch, keyframes never re-decoded); the oracle re-derives
    // both generations' banded buckets (cap per generation) and the
    // exact union of the cross and within-batch clip-pair aggregations,
    // with fractions denominated by the a-side clip's keyframes.
    QuerySpec(
      "q135_video_neardup_incr",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // the index is the PERSISTED nightly artifact — built once per
        // sf-dir per JVM (the q102/q134 memo discipline) and read back
        // from parquet, so the verified-and-benched path is the probe
        // (work ∝ batch), not the nightly build
        val index = s.read.parquet(cachedVideoBandIndex(s, d))
        videoNearDupIncremental(index, dHashFrames(
            withVideoKeyframes(docs.filter(col("doc_id") < 250))).toDF())
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH ids AS (
          SELECT doc_id,
                 CAST(doc_id % 25 AS BIGINT) AS seed,
                 CAST(doc_id % 40 + 10 AS BIGINT) AS nf
          FROM documents),
        dims AS (
          SELECT doc_id, seed, nf,
                 CAST(seed % 8 + 12 AS BIGINT) AS w,
                 CAST(seed % 6 + 9 AS BIGINT) AS h
          FROM ids),
        frames AS (
          SELECT d.doc_id, d.seed, d.w, d.h, f.range AS f
          FROM dims d CROSS JOIN range(0, 50) f
          WHERE f.range % 8 = 0 AND f.range < d.nf),
        cells AS (
          SELECT fr.doc_id, fr.f, r.range AS r, c.range AS c,
                 (fr.seed*31 + fr.f*101
                  + ((c.range*fr.w)//9)*((c.range*fr.w)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.h)//8)*((r.range*fr.h)//8)*13) % 256 AS g,
                 (fr.seed*31 + fr.f*101
                  + (((c.range+1)*fr.w)//9)*(((c.range+1)*fr.w)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.h)//8)*((r.range*fr.h)//8)*13) % 256 AS gn
          FROM frames fr CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        bits AS (SELECT doc_id, f, r*8 + c AS k,
                        CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                 FROM cells),
        hashes AS (
          SELECT doc_id, f,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM bits GROUP BY doc_id, f),
        nkeys AS (SELECT doc_id, COUNT(*) AS n_key FROM hashes GROUP BY doc_id),
        banded AS (
          SELECT doc_id, f, hi, lo, doc_id < 250 AS is_new, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY is_new, band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64),
        matched AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.f AS frame_a, b.doc_id AS doc_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.bval = b.bval AND b.is_new
           AND (NOT a.is_new OR a.doc_id < b.doc_id)
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        pairs AS (
          SELECT doc_a, doc_b, COUNT(*) AS n_matched
          FROM matched GROUP BY doc_a, doc_b)
        SELECT p.doc_a, p.doc_b, CAST(p.n_matched AS BIGINT) AS n_matched,
               CAST(ka.n_key AS BIGINT) AS n_key_a,
               CAST(kb.n_key AS BIGINT) AS n_key_b,
               ROUND(CAST(p.n_matched AS DOUBLE) / ka.n_key, 6) AS match_frac
        FROM pairs p
        JOIN nkeys ka ON ka.doc_id = p.doc_a
        JOIN nkeys kb ON kb.doc_id = p.doc_b
        WHERE ROUND(CAST(p.n_matched AS DOUBLE) / ka.n_key, 6) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // REAL decode + nearest-neighbor resample, same oracle construction
    QuerySpec(
      "q95_media_resize_real",
      (s, d) => resizeImageNN(withPngMedia(Tables.documents(s, d)), 4, 3)
        .toDF().orderBy(col("doc_id")),
      Some("""
        WITH px AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h
          FROM documents),
        r AS (
          SELECT doc_id,
                 (doc_id*31 + ((xs.x*w)//4)*7 + ((ys.y*h)//3)*13) % 256 AS gray
          FROM px, LATERAL unnest(range(0, 4)) AS xs(x),
                   LATERAL unnest(range(0, 3)) AS ys(y))
        SELECT doc_id, CAST(4 AS INT) AS out_w, CAST(3 AS INT) AS out_h,
               CAST(SUM(gray) AS BIGINT) AS pixel_sum
        FROM r GROUP BY doc_id ORDER BY doc_id""")),

    QuerySpec(
      "q97_audio_decode_real",
      (s, d) => decodeAudio(withWavMedia(Tables.documents(s, d)))
        .toDF().orderBy(col("doc_id")),
      Some("""
        WITH p AS (
          SELECT doc_id, CAST(doc_id % 50 + 30 AS BIGINT) AS n FROM documents),
        s AS (
          SELECT doc_id, n, i.i AS i,
                 (doc_id*131 + i.i*787) % 4096 - 2048 AS v
          FROM p, LATERAL unnest(range(0, n)) AS i(i)),
        w AS (
          SELECT doc_id, n, i, v,
                 LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
          FROM s)
        SELECT doc_id, MAX(n) AS n_samples, CAST(SUM(v) AS BIGINT) AS sum_val,
               CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
               CAST(COUNT(*) FILTER (WHERE pv IS NOT NULL AND ((pv < 0) != (v < 0)))
                    AS BIGINT) AS zero_cross,
               CAST(MAX(ABS(v)) AS BIGINT) AS peak
        FROM w GROUP BY doc_id ORDER BY doc_id""")),

    QuerySpec(
      "q98_audio_resample_real",
      (s, d) => resampleAudioNN(withWavMedia(Tables.documents(s, d)), 16)
        .toDF().orderBy(col("doc_id")),
      Some("""
        WITH p AS (
          SELECT doc_id, CAST(doc_id % 50 + 30 AS BIGINT) AS n FROM documents),
        r AS (
          SELECT doc_id, (i.i * n) // 16 AS src
          FROM p, LATERAL unnest(range(0, 16)) AS i(i)),
        v AS (
          SELECT doc_id, (doc_id*131 + src*787) % 4096 - 2048 AS v FROM r)
        SELECT doc_id, CAST(16 AS INT) AS target_n, CAST(SUM(v) AS BIGINT) AS sum_val
        FROM v GROUP BY doc_id ORDER BY doc_id""")),

    // Perceptual audio fingerprint over the REAL decode path: the oracle
    // rebuilds the 33 frame energies (densified — empty frames are 0)
    // and all 32 comparison bits from the shared sample formula.
    QuerySpec(
      "q118_audio_fingerprint",
      (s, d) => audioFingerprint(withWavMedia(Tables.documents(s, d)))
        .toDF().orderBy(col("doc_id")),
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 50 + 30 AS BIGINT) AS n FROM documents),
        samp AS (
          SELECT doc_id, n, (s.range*33)//n AS f,
                 ABS((doc_id*131 + s.range*787) % 4096 - 2048) AS a
          FROM ids CROSS JOIN range(0, 80) s
          WHERE s.range < n),
        energies AS (
          SELECT doc_id, f, SUM(a) AS e FROM samp GROUP BY doc_id, f),
        frames AS (
          SELECT i.doc_id, i.n, f.range AS f, COALESCE(e.e, 0) AS e
          FROM ids i CROSS JOIN range(0, 33) f
          LEFT JOIN energies e ON e.doc_id = i.doc_id AND e.f = f.range),
        bits AS (
          SELECT a.doc_id, a.n, a.f AS k,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM frames a JOIN frames b
            ON a.doc_id = b.doc_id AND b.f = a.f + 1
          WHERE a.f < 32)
        SELECT doc_id, MAX(n) AS n_samples,
               CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS fingerprint
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // Perceptual audio dedup: exact-fingerprint groups with a canonical
    // member — same oracle construction, then a plain GROUP BY.
    QuerySpec(
      "q119_audio_dedup",
      (s, d) => audioDedupGroups(
          audioFingerprint(withWavMedia(Tables.documents(s, d))).toDF())
        .orderBy(col("fingerprint")),
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 50 + 30 AS BIGINT) AS n FROM documents),
        samp AS (
          SELECT doc_id, n, (s.range*33)//n AS f,
                 ABS((doc_id*131 + s.range*787) % 4096 - 2048) AS a
          FROM ids CROSS JOIN range(0, 80) s
          WHERE s.range < n),
        energies AS (
          SELECT doc_id, f, SUM(a) AS e FROM samp GROUP BY doc_id, f),
        frames AS (
          SELECT i.doc_id, f.range AS f, COALESCE(e.e, 0) AS e
          FROM ids i CROSS JOIN range(0, 33) f
          LEFT JOIN energies e ON e.doc_id = i.doc_id AND e.f = f.range),
        bits AS (
          SELECT a.doc_id, a.f AS k,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM frames a JOIN frames b
            ON a.doc_id = b.doc_id AND b.f = a.f + 1
          WHERE a.f < 32),
        fps AS (
          SELECT doc_id,
                 CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS fingerprint
          FROM bits GROUP BY doc_id)
        SELECT fingerprint, COUNT(*) AS n_copies,
               MIN(doc_id) AS canonical_id
        FROM fps GROUP BY fingerprint HAVING COUNT(*) >= 2
        ORDER BY fingerprint""")),

    // Banded-hamming audio near-dup: the graded companion to q119's
    // exact-fingerprint groups — same fingerprint oracle algebra plus
    // the 4×8-bit banding + cap + pair verify mirrored in SQL.
    QuerySpec(
      "q136_audio_neardup",
      (s, d) => audioNearDupPairs(
          audioFingerprint(withWavMedia(Tables.documents(s, d))).toDF())
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 50 + 30 AS BIGINT) AS n FROM documents),
        samp AS (
          SELECT doc_id, n, (s.range*33)//n AS f,
                 ABS((doc_id*131 + s.range*787) % 4096 - 2048) AS a
          FROM ids CROSS JOIN range(0, 80) s
          WHERE s.range < n),
        energies AS (
          SELECT doc_id, f, SUM(a) AS e FROM samp GROUP BY doc_id, f),
        frames AS (
          SELECT i.doc_id, f.range AS f, COALESCE(e.e, 0) AS e
          FROM ids i CROSS JOIN range(0, 33) f
          LEFT JOIN energies e ON e.doc_id = i.doc_id AND e.f = f.range),
        bits AS (
          SELECT a.doc_id, a.f AS k,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM frames a JOIN frames b
            ON a.doc_id = b.doc_id AND b.f = a.f + 1
          WHERE a.f < 32),
        fps AS (
          SELECT doc_id,
                 CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS fingerprint
          FROM bits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, fingerprint, b.range AS band,
                 (fingerprint // (1::BIGINT << (8*b.range))) % 256 AS bval
          FROM fps CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS BIGINT)
                 AS hamming
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
        ORDER BY doc_a, doc_b""")),

    // Cross-modal curation composition: the oracle re-derives the image
    // loser set (q116 banded topology) AND the audio loser set (q119
    // fingerprint groups) and anti-joins both — gated down to exactly
    // which docs survive.
    QuerySpec(
      "q123_media_curation",
      (s, d) => {
        val docs = Tables.documents(s, d)
        curateMedia(docs.select(col("doc_id"), col("source")),
            dHashImages(withPngMedia(docs)).toDF(),
            audioFingerprint(withWavMedia(docs)).toDF())
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h,
                 CAST(doc_id % 50 + 30 AS BIGINT) AS n
          FROM documents),
        cells AS (
          SELECT i.doc_id, r.range AS r, c.range AS c,
                 (i.doc_id*31 + ((c.range*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS g,
                 (i.doc_id*31 + (((c.range+1)*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS gn
          FROM ids i CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        ibits AS (SELECT doc_id, r*8 + c AS k,
                         CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                  FROM cells),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM ibits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64),
        img_losers AS (
          SELECT DISTINCT b.doc_id
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6),
        samp AS (
          SELECT doc_id, n, (s.range*33)//n AS f,
                 ABS((doc_id*131 + s.range*787) % 4096 - 2048) AS a
          FROM ids CROSS JOIN range(0, 80) s
          WHERE s.range < n),
        energies AS (
          SELECT doc_id, f, SUM(a) AS e FROM samp GROUP BY doc_id, f),
        frames AS (
          SELECT i.doc_id, f.range AS f, COALESCE(e.e, 0) AS e
          FROM ids i CROSS JOIN range(0, 33) f
          LEFT JOIN energies e ON e.doc_id = i.doc_id AND e.f = f.range),
        abits AS (
          SELECT a.doc_id, a.f AS k,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM frames a JOIN frames b
            ON a.doc_id = b.doc_id AND b.f = a.f + 1
          WHERE a.f < 32),
        fps AS (
          SELECT doc_id,
                 CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS fingerprint
          FROM abits GROUP BY doc_id),
        aud_losers AS (
          SELECT f.doc_id
          FROM fps f JOIN (SELECT fingerprint, MIN(doc_id) AS can
                           FROM fps GROUP BY fingerprint) g
            ON f.fingerprint = g.fingerprint
          WHERE f.doc_id <> g.can)
        SELECT doc_id, source FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM img_losers)
          AND doc_id NOT IN (SELECT doc_id FROM aud_losers)
        ORDER BY doc_id""")),

    // FULL cross-modal curation (r10): q123's image + audio legs plus
    // the clip-level VIDEO leg (q133's near-dup, doc_b losers) — the
    // oracle re-derives all three loser sets and anti-joins them, gated
    // down to exactly which docs survive all three modalities.
    QuerySpec(
      "q140_media_curation_full",
      (s, d) => {
        val docs = Tables.documents(s, d)
        curateMedia(docs.select(col("doc_id"), col("source")),
            dHashImages(withPngMedia(docs)).toDF(),
            audioFingerprint(withWavMedia(docs)).toDF(),
            videoFrameHashes =
              Some(dHashFrames(withVideoKeyframes(docs)).toDF()))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH ids AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h,
                 CAST(doc_id % 50 + 30 AS BIGINT) AS n,
                 CAST(doc_id % 25 AS BIGINT) AS seed,
                 CAST(doc_id % 40 + 10 AS BIGINT) AS nf
          FROM documents),
        cells AS (
          SELECT i.doc_id, r.range AS r, c.range AS c,
                 (i.doc_id*31 + ((c.range*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS g,
                 (i.doc_id*31 + (((c.range+1)*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS gn
          FROM ids i CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        ibits AS (SELECT doc_id, r*8 + c AS k,
                         CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                  FROM cells),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM ibits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64),
        img_losers AS (
          SELECT DISTINCT b.doc_id
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6),
        samp AS (
          SELECT doc_id, n, (s.range*33)//n AS f,
                 ABS((doc_id*131 + s.range*787) % 4096 - 2048) AS a
          FROM ids CROSS JOIN range(0, 80) s
          WHERE s.range < n),
        energies AS (
          SELECT doc_id, f, SUM(a) AS e FROM samp GROUP BY doc_id, f),
        frames AS (
          SELECT i.doc_id, f.range AS f, COALESCE(e.e, 0) AS e
          FROM ids i CROSS JOIN range(0, 33) f
          LEFT JOIN energies e ON e.doc_id = i.doc_id AND e.f = f.range),
        abits AS (
          SELECT a.doc_id, a.f AS k,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM frames a JOIN frames b
            ON a.doc_id = b.doc_id AND b.f = a.f + 1
          WHERE a.f < 32),
        afps AS (
          SELECT doc_id,
                 CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS fingerprint
          FROM abits GROUP BY doc_id),
        aud_losers AS (
          SELECT f.doc_id
          FROM afps f JOIN (SELECT fingerprint, MIN(doc_id) AS can
                            FROM afps GROUP BY fingerprint) g
            ON f.fingerprint = g.fingerprint
          WHERE f.doc_id <> g.can),
        vframes AS (
          SELECT i.doc_id, i.seed,
                 CAST(i.seed % 8 + 12 AS BIGINT) AS vw,
                 CAST(i.seed % 6 + 9 AS BIGINT) AS vh,
                 f.range AS f
          FROM ids i CROSS JOIN range(0, 50) f
          WHERE f.range % 8 = 0 AND f.range < i.nf),
        vcells AS (
          SELECT fr.doc_id, fr.f, r.range AS r, c.range AS c,
                 (fr.seed*31 + fr.f*101
                  + ((c.range*fr.vw)//9)*((c.range*fr.vw)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.vh)//8)*((r.range*fr.vh)//8)*13) % 256 AS g,
                 (fr.seed*31 + fr.f*101
                  + (((c.range+1)*fr.vw)//9)*(((c.range+1)*fr.vw)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.vh)//8)*((r.range*fr.vh)//8)*13) % 256 AS gn
          FROM vframes fr CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        vbits AS (SELECT doc_id, f, r*8 + c AS k,
                         CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                  FROM vcells),
        vhashes AS (
          SELECT doc_id, f,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM vbits GROUP BY doc_id, f),
        vnkeys AS (SELECT doc_id, COUNT(*) AS n_key FROM vhashes GROUP BY doc_id),
        vbanded AS (
          SELECT doc_id, f, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM vhashes CROSS JOIN range(0, 4) b),
        vcapped AS (
          SELECT * FROM (SELECT vbanded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM vbanded)
          WHERE bn <= 64),
        vmatched AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.f AS frame_a, b.doc_id AS doc_b
          FROM vcapped a JOIN vcapped b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        vpairs AS (
          SELECT doc_a, doc_b, COUNT(*) AS n_matched
          FROM vmatched GROUP BY doc_a, doc_b),
        vid_losers AS (
          SELECT DISTINCT p.doc_b AS doc_id
          FROM vpairs p JOIN vnkeys ka ON ka.doc_id = p.doc_a
          WHERE ROUND(CAST(p.n_matched AS DOUBLE) / ka.n_key, 6) >= 0.5)
        SELECT doc_id, source FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM img_losers)
          AND doc_id NOT IN (SELECT doc_id FROM aud_losers)
          AND doc_id NOT IN (SELECT doc_id FROM vid_losers)
        ORDER BY doc_id""")),

    // Cluster-canonical cross-modal curation (r10): the q140 pair set
    // routed through connected components — one keeper per connected
    // cross-modal component. The oracle re-derives all three edge legs
    // and runs the recursive-CTE CC (q49's construction), gated down to
    // every doc's component label and retained flag.
    QuerySpec(
      "q141_media_clusters",
      (s, d) => {
        val docs = Tables.documents(s, d)
        curateMediaClusters(docs.select(col("doc_id"), col("source")),
            dHashImages(withPngMedia(docs)).toDF(),
            audioFingerprint(withWavMedia(docs)).toDF(),
            videoFrameHashes =
              Some(dHashFrames(withVideoKeyframes(docs)).toDF()))
          .select(col("doc_id"), col("source"), col("comp"),
            col("retained").cast("bigint").as("retained"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH RECURSIVE ids AS (
          SELECT doc_id, CAST(doc_id % 8 + 4 AS BIGINT) AS w,
                 CAST(doc_id % 6 + 3 AS BIGINT) AS h,
                 CAST(doc_id % 50 + 30 AS BIGINT) AS n,
                 CAST(doc_id % 25 AS BIGINT) AS seed,
                 CAST(doc_id % 40 + 10 AS BIGINT) AS nf
          FROM documents),
        cells AS (
          SELECT i.doc_id, r.range AS r, c.range AS c,
                 (i.doc_id*31 + ((c.range*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS g,
                 (i.doc_id*31 + (((c.range+1)*i.w)//9)*7 + ((r.range*i.h)//8)*13) % 256 AS gn
          FROM ids i CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        ibits AS (SELECT doc_id, r*8 + c AS k,
                         CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                  FROM cells),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM ibits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM hashes CROSS JOIN range(0, 4) b),
        capped AS (
          SELECT * FROM (SELECT banded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM banded)
          WHERE bn <= 64),
        img_pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6),
        samp AS (
          SELECT doc_id, n, (s.range*33)//n AS f,
                 ABS((doc_id*131 + s.range*787) % 4096 - 2048) AS a
          FROM ids CROSS JOIN range(0, 80) s
          WHERE s.range < n),
        energies AS (
          SELECT doc_id, f, SUM(a) AS e FROM samp GROUP BY doc_id, f),
        frames AS (
          SELECT i.doc_id, f.range AS f, COALESCE(e.e, 0) AS e
          FROM ids i CROSS JOIN range(0, 33) f
          LEFT JOIN energies e ON e.doc_id = i.doc_id AND e.f = f.range),
        abits AS (
          SELECT a.doc_id, a.f AS k,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM frames a JOIN frames b
            ON a.doc_id = b.doc_id AND b.f = a.f + 1
          WHERE a.f < 32),
        afps AS (
          SELECT doc_id,
                 CAST(SUM(bit * (1::BIGINT << k)) AS BIGINT) AS fingerprint
          FROM abits GROUP BY doc_id),
        aud_pairs AS (
          SELECT g.can AS doc_a, f.doc_id AS doc_b
          FROM afps f JOIN (SELECT fingerprint, MIN(doc_id) AS can
                            FROM afps GROUP BY fingerprint) g
            ON f.fingerprint = g.fingerprint
          WHERE f.doc_id <> g.can),
        vframes AS (
          SELECT i.doc_id, i.seed,
                 CAST(i.seed % 8 + 12 AS BIGINT) AS vw,
                 CAST(i.seed % 6 + 9 AS BIGINT) AS vh,
                 f.range AS f
          FROM ids i CROSS JOIN range(0, 50) f
          WHERE f.range % 8 = 0 AND f.range < i.nf),
        vcells AS (
          SELECT fr.doc_id, fr.f, r.range AS r, c.range AS c,
                 (fr.seed*31 + fr.f*101
                  + ((c.range*fr.vw)//9)*((c.range*fr.vw)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.vh)//8)*((r.range*fr.vh)//8)*13) % 256 AS g,
                 (fr.seed*31 + fr.f*101
                  + (((c.range+1)*fr.vw)//9)*(((c.range+1)*fr.vw)//9)*(7 + fr.f % 5)
                  + ((r.range*fr.vh)//8)*((r.range*fr.vh)//8)*13) % 256 AS gn
          FROM vframes fr CROSS JOIN range(0, 8) r CROSS JOIN range(0, 8) c),
        vbits AS (SELECT doc_id, f, r*8 + c AS k,
                         CASE WHEN g < gn THEN 1 ELSE 0 END AS bit
                  FROM vcells),
        vhashes AS (
          SELECT doc_id, f,
                 CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
                      AS BIGINT) AS hi,
                 CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
                      AS BIGINT) AS lo
          FROM vbits GROUP BY doc_id, f),
        vnkeys AS (SELECT doc_id, COUNT(*) AS n_key FROM vhashes GROUP BY doc_id),
        vbanded AS (
          SELECT doc_id, f, hi, lo, b.range AS band,
                 CASE WHEN b.range = 0 THEN lo % 65536
                      WHEN b.range = 1 THEN lo // 65536
                      WHEN b.range = 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bval
          FROM vhashes CROSS JOIN range(0, 4) b),
        vcapped AS (
          SELECT * FROM (SELECT vbanded.*,
                                COUNT(*) OVER (PARTITION BY band, bval) AS bn
                         FROM vbanded)
          WHERE bn <= 64),
        vmatched AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.f AS frame_a, b.doc_id AS doc_b
          FROM vcapped a JOIN vcapped b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        vid_pairs AS (
          SELECT p.doc_a, p.doc_b
          FROM (SELECT doc_a, doc_b, COUNT(*) AS n_matched
                FROM vmatched GROUP BY doc_a, doc_b) p
          JOIN vnkeys ka ON ka.doc_id = p.doc_a
          WHERE ROUND(CAST(p.n_matched AS DOUBLE) / ka.n_key, 6) >= 0.5),
        all_pairs AS (
          SELECT doc_a, doc_b FROM img_pairs
          UNION SELECT doc_a, doc_b FROM aud_pairs
          UNION SELECT doc_a, doc_b FROM vid_pairs),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM all_pairs
                  UNION SELECT doc_b, doc_a FROM all_pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
        comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
        SELECT d.doc_id, d.source,
               COALESCE(c.comp, d.doc_id) AS comp,
               CAST(CASE WHEN COALESCE(c.comp, d.doc_id) = d.doc_id
                         THEN 1 ELSE 0 END AS BIGINT) AS retained
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        ORDER BY d.doc_id""")),

    QuerySpec(
      "q52_frame_sample",
      (s, d) => sampleFrames(withMedia(Tables.documents(s, d)), 8)
        .groupBy(col("meta.format").as("format"))
        .agg(count(lit(1)).as("n_frames_sampled"),
             max(col("frame_idx")).as("max_frame_idx"))
        .orderBy(col("format")),
      Some("""
        SELECT format, COUNT(*) AS n_frames_sampled, MAX(frame_idx) AS max_frame_idx
        FROM (
          SELECT ['png','jpeg','webm'][CAST(doc_id % 3 + 1 AS INT)] AS format,
                 unnest(range(0, CAST(octet_length(CAST(text AS BLOB)) // 16 AS INT), 8)) AS frame_idx
          FROM documents)
        GROUP BY format
        ORDER BY format"""))
  )
}
