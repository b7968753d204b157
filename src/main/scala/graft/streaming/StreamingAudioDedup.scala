package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Incremental perceptual AUDIO dedup over a stream — the online twin of
  * [[graft.operators.Multimodal.audioNearDupPairs]], closing the
  * streaming near-dup family across modalities (text LSH:
  * [[StreamingDedup]]; embeddings: [[StreamingCosineDedup]]; images:
  * [[StreamingImageDedup]]; video clips: [[StreamingVideoDedup]]; audio:
  * here). A continuously-ingesting audio crawl can't re-band the full
  * corpus per batch, so the band index lives in SPI state: each arriving
  * fingerprint probes exactly the 4 buckets its 8-bit bands land in,
  * compares popcount-hamming against the bucket's members, and joins the
  * bucket.
  *
  * Input is the fingerprint stream (`doc_id`, `fingerprint`) — in
  * production produced by [[graft.operators.Multimodal.audioFingerprint]]
  * on the decoded media stream (mapPartitions runs unchanged on a
  * streaming Dataset); only 12 B/clip ever reaches state, never PCM.
  * Bands are the same 4×8-bit split as the batch operator
  * ([[graft.operators.Multimodal.audioBands]] — one definition), so a
  * stream replay reproduces the batch candidate topology, with the
  * standing overflow semantics: batch retroactively drops a bucket that
  * exceeds `maxBucketSize`, the stream (Append mode, cannot retract)
  * stops admitting instead — a superset of batch on overflowed buckets,
  * identical everywhere else, and by pigeonhole LOSSLESS at the default
  * `maxHamming ≤ 3` for in-cap buckets.
  *
  * Scale notes mirror [[StreamingImageDedup]]: prospective admission
  * bound, per-member TTL so a long-running crawl's index is proportional
  * to the horizon window, membership counted from the live list, and a
  * pair colliding in b bands is emitted up to b times — dedupe
  * downstream with a state-backed `dropDuplicates("docA","docB")` under
  * the caller's watermark.
  */
object StreamingAudioDedup {

  case class BandedFp(band: Int, bval: Long, docId: Long, fp: Long)
  case class FpMember(docId: Long, fp: Long)
  case class AudioPair(docA: Long, docB: Long, hamming: Long)

  /** Per-(band, bval) processor: popcount-hamming compare-then-join
    * against bucket members over the 32-bit fingerprint word — the same
    * arithmetic as the batch operator and its SQL oracle. */
  class FpBucketProcessor(maxHamming: Int, maxBucketSize: Int,
                          ttl: TTLConfig)
      extends StatefulProcessor[(Int, Long), BandedFp, AudioPair] {
    @transient private var members: ListState[FpMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[FpMember]("members",
        Encoders.product[FpMember], ttl)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedFp],
                                 timerValues: TimerValues): Iterator[AudioPair] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AudioPair]
      rows.foreach { h =>
        // materialize-first admission bound: a full bucket skips the
        // hamming math entirely
        val current = members.get().toArray
        if (current.length < maxBucketSize) {
          current.foreach { m =>
            if (m.docId != h.docId) {
              val d = java.lang.Long.bitCount(h.fp ^ m.fp)
              if (d <= maxHamming) {
                val (a, b) =
                  if (h.docId < m.docId) (h.docId, m.docId) else (m.docId, h.docId)
                out += AudioPair(a, b, d.toLong)
              }
            }
          }
          members.appendValue(FpMember(h.docId, h.fp))
        }
      }
      out.iterator
    }
  }

  /** Near-dup audio pairs of a streaming fingerprint frame (columns
    * `doc_id`, `fingerprint`), emitted incrementally.
    *
    * @param ttl dedup horizon: bucket members expire this long after
    *        insertion (native TTL through our providers' TTL column
    *        families). `None` = remember forever.
    */
  def audioPairsStream(fingerprints: DataFrame, maxHamming: Int = 3,
                       maxBucketSize: Int = 64,
                       ttl: Option[java.time.Duration] = None): Dataset[AudioPair] = {
    require(maxHamming >= 0 && maxHamming <= 32, s"bad maxHamming $maxHamming")
    val spark = fingerprints.sparkSession
    import spark.implicits._
    val banded = fingerprints.select(
        posexplode(graft.operators.Multimodal.audioBands(col("fingerprint")))
          .as(Seq("band", "bval")),
        col("doc_id").as("docId"), col("fingerprint").as("fp"))
      .as[BandedFp]
    val (ttlConf, timeMode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    banded.groupByKey(h => (h.band, h.bval))
      .transformWithState(
        new FpBucketProcessor(maxHamming, maxBucketSize, ttlConf),
        timeMode, OutputMode.Append())
  }
}
