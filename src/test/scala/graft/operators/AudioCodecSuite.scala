package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Real javax.sound.sampled codec path: WAV encode→decode round-trips the
  * generative s16 samples exactly (PCM is lossless); the blob is a real
  * RIFF/WAVE container, not raw samples; nearest-neighbor resample reads
  * floor-mapped source samples in both directions; corrupt payloads fail
  * loudly instead of producing silent garbage features.
  */
class AudioCodecSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-audio-codec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sampleRef(id: Long, i: Int): Int =
    ((id * 131 + i * 787L) % 4096 - 2048).toInt

  private def nRef(id: Long): Int = (id % 50 + 30).toInt

  test("WAV round-trip reproduces the generative samples exactly") {
    val sql = spark
    import sql.implicits._
    val ids = Seq(0L, 1L, 7L, 123L)
    val feats = Multimodal.decodeAudio(Multimodal.withWavMedia(ids.toDF("doc_id")))
      .collect().map(f => f.doc_id -> f).toMap
    ids.foreach { id =>
      val s = (0 until nRef(id)).map(sampleRef(id, _))
      val f = feats(id)
      assert(f.n_samples === s.length.toLong, s"doc $id sample count")
      assert(f.sum_val === s.map(_.toLong).sum, s"doc $id sum")
      assert(f.sum_abs === s.map(v => math.abs(v).toLong).sum, s"doc $id abs sum")
      assert(f.peak === s.map(v => math.abs(v).toLong).max, s"doc $id peak")
      val zc = s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(f.zero_cross === zc.toLong, s"doc $id zero crossings")
    }
  }

  test("the blob is a real RIFF/WAVE container with a parseable header") {
    val sql = spark
    import sql.implicits._
    val row = Multimodal.withWavMedia(Seq(42L).toDF("doc_id")).collect().head
    // RIFF....WAVE magic — proves a container write, not a raw PCM dump
    assert(new String(row.data.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(row.data.slice(8, 12), "US-ASCII") === "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(row.data))
    assert(ais.getFrameLength === nRef(42L).toLong)
    assert(ais.getFormat.getSampleRate === 8000f)
    ais.close()
  }

  test("nearest-neighbor resample reads floor-mapped source samples, both directions") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(5L).toDF("doc_id") // 35 source samples
    val n = nRef(5L)
    val down = Multimodal.resampleAudioNN(Multimodal.withWavMedia(docs), 16)
      .collect().head
    val expDown = (0 until 16).map(i => sampleRef(5L, (i.toLong * n / 16).toInt).toLong).sum
    assert(down.sum_val === expDown)
    assert(down.target_n === 16)
    val up = Multimodal.resampleAudioNN(Multimodal.withWavMedia(docs), 70)
      .collect().head
    val expUp = (0 until 70).map(i => sampleRef(5L, (i.toLong * n / 70).toInt).toLong).sum
    assert(up.sum_val === expUp)
    intercept[IllegalArgumentException] {
      Multimodal.resampleAudioNN(Multimodal.withWavMedia(docs), 0)
    }
  }

  private def wavOf(id: Long, samples: Array[Int]): Multimodal.WavRow = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    Multimodal.WavRow(id, out.toByteArray)
  }

  /** Independent reimplementation of the 33-frame envelope fingerprint. */
  private def fpRef(samples: Seq[Int]): Long = {
    val e = new Array[Long](33)
    samples.zipWithIndex.foreach { case (s, i) =>
      e(i * 33 / samples.length) += math.abs(s)
    }
    (0 until 32).foldLeft(0L)((fp, f) =>
      if (e(f) > e(f + 1)) fp | (1L << f) else fp)
  }

  test("fingerprint: envelope shape drives the bits; decode path is exact") {
    val sql = spark
    import sql.implicits._
    val falling = Array.tabulate(66)(i => 2000 - 30 * i)  // strictly falling energy
    val rising = falling.reverse
    val rows = Seq(wavOf(1L, falling), wavOf(2L, rising), wavOf(3L, falling)).toDS()
    val fps = Multimodal.audioFingerprint(rows)
      .collect().map(f => f.doc_id -> f.fingerprint).toMap
    assert(fps(1L) == 0xFFFFFFFFL, "falling envelope sets all 32 comparison bits")
    assert(fps(2L) == 0L, "rising envelope sets none")
    assert(fps(1L) == fps(3L), "identical clips collide")

    // formula clips, incl. n=30 < 33 frames (empty-frame path), against
    // an independent reference computation
    val formulaIds = Seq(0L, 1L, 5L, 123L)
    val got = Multimodal.audioFingerprint(
        Multimodal.withWavMedia(formulaIds.toDF("doc_id")))
      .collect().map(f => f.doc_id -> f.fingerprint).toMap
    formulaIds.foreach { id =>
      val ref = fpRef((0 until nRef(id)).map(sampleRef(id, _)))
      assert(got(id) == ref, s"doc $id fingerprint vs reference")
    }
  }

  test("audio dedup groups exact-fingerprint copies with a canonical member") {
    val sql = spark
    import sql.implicits._
    val a = Array.tabulate(50)(i => 1500 - 25 * i)
    val b = Array.tabulate(50)(i => if (i % 2 == 0) 900 else -900) // flat: fp 0
    val rows = Seq(wavOf(10L, a), wavOf(11L, a), wavOf(12L, b)).toDS()
    val groups = Multimodal.audioDedupGroups(
        Multimodal.audioFingerprint(rows).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(groups.length == 1, s"one dup group expected, got ${groups.toSeq}")
    assert(groups.head._2 == 2L && groups.head._3 == 10L,
      "two copies, canonical = min doc_id")
  }

  test("banded near-dup: lossless at hamming <= 3; exact join misses what it catches") {
    val sql = spark
    import sql.implicits._
    val base = Array.tabulate(66)(i => 2000 - 30 * i) // all 32 bits set
    // flip exactly one comparison: lift frame 17's energy above frame 16's
    // (2 samples per frame at n=66) — hamming 1 from base, invisible to
    // the exact-fingerprint join
    val oneOff = base.clone()
    oneOff(34) = 3000; oneOff(35) = 3000
    val rows = Seq(wavOf(1L, base), wavOf(2L, oneOff), wavOf(3L, base)).toDS()
    val fps = Multimodal.audioFingerprint(rows).toDF()
      .localCheckpoint(true)
    assert(Multimodal.audioDedupGroups(fps)
      .collect().map(_.getLong(2)).toSeq == Seq(1L),
      "exact join groups only the identical pair")
    val pairs = Multimodal.audioNearDupPairs(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 2L) -> 1L, (1L, 3L) -> 0L, (2L, 3L) -> 1L),
      s"near-dup must grade the one-bit re-encode: $pairs")
    // brute-force parity on formula clips: banding loses nothing at <= 3
    val ids = (0L until 60L).toSeq
    val formulaFps = Multimodal.audioFingerprint(
        Multimodal.withWavMedia(ids.toDF("doc_id"))).toDF()
      .localCheckpoint(true)
    val got = Multimodal.audioNearDupPairs(formulaFps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = formulaFps.collect().map(r => (r.getLong(0), r.getLong(2)))
    val expect = (for {
      (da, fa) <- all; (db, fb) <- all
      if da < db && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (da, db)).toSet
    assert(got === expect, s"banding must be lossless at hamming<=3")
  }

  test("corrupt payloads fail loudly, not as garbage features") {
    val sql = spark
    import sql.implicits._
    val bad = Seq(Multimodal.WavRow(1L, Array[Byte](1, 2, 3, 4))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(bad).collect()
    }
    assert(e.getMessage != null)
  }
}
