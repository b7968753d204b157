package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.operators.HistogramSketch

/** Streaming twin of [[graft.operators.HistogramSketch.eventGapQuantiles]]
  * (q163): live p50/p90/p99 inter-event gaps per event type — the
  * observability panel a pipeline watches, not recomputes nightly.
  *
  * Two chained stateful operators (the [[StreamingVideoDedup]] shape):
  *
  *  1. per-USER gap extraction — a ValueState holds the user's latest
  *     `(ts, id)`; each batch's rows fold in `(ts, id)` order (the batch
  *     operator's tie rule) and emit one `(event_type, rep)` bucket
  *     arrival per consecutive pair, bucketed through a pure-Scala
  *     mirror of [[graft.operators.HistogramSketch.bucketRep]] whose
  *     agreement with the shipped column is property-pinned
  *     (HistogramPropertySuite);
  *  2. per-TYPE histogram fold — [[StreamingHistogram.HistogramProcessor]]
  *     REUSED VERBATIM (its key is an opaque string; `source` there,
  *     `event_type` here), emitting the updated quantile row.
  *
  * Replay of ts-ordered batches ≡ the batch q163 report exactly: gap
  * extraction is order-deterministic given the tie rule, and histogram
  * insertion is count addition (order-independent). State is bounded:
  * one `(ts, id)` pair per user + one bucket table per event type.
  */
object StreamingEventGaps {

  case class Ev(user_id: Long, ts: Long, event_id: Long, event_type: String)

  private[streaming] case class LastSeen(ts: Long, id: Long)

  /** Pure-Scala mirror of the codegen'd bucketRep column;
    * HistogramPropertySuite pins the agreement on randomized
    * non-negative longs. TOTAL agreement on the defined domain only:
    * the batch column maps a negative value to null (row dropped), a
    * shape a Long-returning mirror cannot express — so negatives are
    * REFUSED loudly here rather than silently mapped to bucket 0
    * (unreachable from [[GapProcessor]], which drops late events before
    * any gap can go negative; a future caller feeding raw deltas hits
    * the require, not a silent batch/stream divergence). */
  private[graft] def bucketRep(
      v: Long,
      subBits: Int = graft.operators.HistogramSketch.DefaultSubBits): Long = {
    require(v >= 0,
      s"bucketRep mirror: negative value $v - the batch column NULLs " +
        "(drops) negatives; filter them before bucketing")
    if (v == 0) 0L
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val shift = math.max(0, e - subBits)
      (v >> shift) << shift
    }
  }

  /** Per-user processor: fold the batch's events in `(ts, id)` order
    * against the stored latest event, emit one bucket arrival per gap. */
  class GapProcessor(subBits: Int)
      extends StatefulProcessor[Long, Ev, StreamingHistogram.DocBucket] {
    @transient private var last: ValueState[LastSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastSeen]("last",
        Encoders.product[LastSeen], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[StreamingHistogram.DocBucket] = {
      val sorted = rows.toArray.sortBy(e => (e.ts, e.event_id))
      val out = Vector.newBuilder[StreamingHistogram.DocBucket]
      var prev = Option(last.get())
      sorted.foreach { e =>
        // an arrival at or before the stored (ts, id) is a LATE event a
        // ts-ordered delivery cannot produce — a negative (or
        // wrong-tie-order) gap would silently drag the histogram toward
        // bucket 0 with no way to retract it, so late events are DROPPED
        // (fail-safe) and never regress state; the replay-≡-batch
        // contract holds for (ts, id)-ordered delivery only
        val late = prev.exists(p =>
          e.ts < p.ts || (e.ts == p.ts && e.event_id <= p.id))
        if (!late) {
          prev.foreach { p =>
            out += StreamingHistogram.DocBucket(e.event_type,
              bucketRep(e.ts - p.ts, subBits))
          }
          prev = Some(LastSeen(e.ts, e.event_id))
        }
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** Quantile-row stream of a streaming events frame (columns `user_id`,
    * `ts` nanos-long, `event_id`, `event_type`): one updated row per
    * (touched event type, batch). */
  def eventGapQuantilesStream(events: DataFrame,
                              subBits: Int = 5): Dataset[StreamingHistogram.QuantileRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts").cast("long"),
        col("event_id").cast("long"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new GapProcessor(subBits),
        TimeMode.None(), OutputMode.Append())
      .groupByKey(_.source)
      .transformWithState(new StreamingHistogram.HistogramProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
