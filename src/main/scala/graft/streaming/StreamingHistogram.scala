package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of [[graft.operators.HistogramSketch]]: per-source
  * bucket counts live in a ValueState and grow by count addition across
  * batches — the merge algebra is lossless, so after a full replay the
  * latest emitted row per source equals the batch
  * [[graft.operators.HistogramSketch.sourceLengthQuantiles]] exactly.
  *
  * The bucket projection runs SPARK-SIDE through the batch operator's own
  * `bucketRep` column (one definition — the kmvHash discipline), so the
  * processor never re-states the bucket math: it folds `(rep)` arrivals
  * into the stored count table and replays the same integer CDF walk
  * (`smallest rep with cum ≥ ceil(n·pct/100)`) the batch summary runs.
  * State is bounded by construction: ≤ (64−s)·2^s + 2^s rep entries per
  * source regardless of stream length.
  */
object StreamingHistogram {

  case class DocBucket(source: String, rep: Long)
  private[streaming] case class Hist(reps: Seq[Long], cnts: Seq[Long])
  case class QuantileRow(source: String, n_docs: Long, n_buckets: Long,
                         p50: Long, p90: Long, p99: Long)

  private[streaming] def quantile(reps: Array[Long], cnts: Array[Long],
                                  n: Long, pct: Int): Long = {
    val target = (n * pct + 99) / 100
    var cum = 0L
    var i = 0
    while (i < reps.length) {
      cum += cnts(i)
      if (cum >= target) return reps(i)
      i += 1
    }
    reps.last
  }

  /** Per-source processor: add the batch's bucket arrivals into the
    * stored count table, emit the updated quantile row. */
  class HistogramProcessor
      extends StatefulProcessor[String, DocBucket, QuantileRow] {
    @transient private var hist: ValueState[Hist] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getValueState[Hist]("hist",
        Encoders.product[Hist], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocBucket],
                                 timerValues: TimerValues): Iterator[QuantileRow] = {
      val cur = Option(hist.get())
        .map(h => collection.mutable.Map(h.reps.zip(h.cnts).toSeq: _*))
        .getOrElse(collection.mutable.Map.empty[Long, Long])
      rows.foreach(d => cur.update(d.rep, cur.getOrElse(d.rep, 0L) + 1L))
      val sorted = cur.toArray.sortBy(_._1)
      hist.update(Hist(sorted.map(_._1).toSeq, sorted.map(_._2).toSeq))
      val reps = sorted.map(_._1)
      val cnts = sorted.map(_._2)
      val n = cnts.sum
      Iterator.single(QuantileRow(key, n, reps.length.toLong,
        quantile(reps, cnts, n, 50),
        quantile(reps, cnts, n, 90),
        quantile(reps, cnts, n, 99)))
    }
  }

  /** Quantile-row stream of a streaming `docs` frame (columns `source`,
    * `text`): one updated row per (touched source, batch). `subBits`
    * matches [[graft.operators.HistogramSketch.sourceLengthQuantiles]]. */
  def sourceLengthQuantilesStream(docs: DataFrame,
                                  subBits: Int = 5): Dataset[QuantileRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("text").isNotNull)
      .select(col("source"),
        graft.operators.HistogramSketch.bucketRep(
          graft.operators.TextOps.tokenCount(col("text")).cast("long"),
          subBits).as("rep"))
      .filter(col("rep").isNotNull)
      .as[DocBucket]
      .groupByKey(_.source)
      .transformWithState(new HistogramProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
