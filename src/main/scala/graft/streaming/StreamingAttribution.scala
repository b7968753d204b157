package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Last-touch attribution over an event STREAM — the online counterpart
  * of [[graft.operators.Sessionize.lastTouch]]: each entity keeps the
  * ordinal of its latest source-type event (one long per entity) and
  * every target-type event is emitted, credited, the micro-batch it
  * arrives — no nightly re-join over the full event log.
  *
  * Semantics vs batch: within a micro-batch, events fold in `eventId`
  * order, so a source and a target arriving in the same batch attribute
  * exactly as the batch window would; the strictly-before rule holds
  * because the fold credits BEFORE applying the current event's own
  * update. Across batches, a source event arriving late (after a target
  * it should have been credited for was already emitted) cannot
  * retroactively re-credit it — the price of incremental emission, same
  * trade as [[StreamingFunnel]].
  *
  * Scale notes: state is ONE long per entity (the smallest attribution
  * state possible), disk-resident under the RocksDB-backed provider; the
  * only shuffle is the entity-key exchange every stateful operator pays.
  * An optional TTL bounds state for entities that go quiet — attribution
  * windows ("credit clicks from the last 30 days") map directly onto it.
  */
object StreamingAttribution {

  case class AttrEvent(userId: Long, eventId: Long, eventType: String)
  /** `sourceId` is None when no source-type event preceded the target. */
  case class Attribution(userId: Long, targetId: Long, sourceId: Option[Long])

  class LastTouchProcessor(targetType: String, sourceType: String,
                           ttl: TTLConfig)
      extends StatefulProcessor[Long, AttrEvent, Attribution] {
    @transient private var lastSource: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSource = getHandle.getValueState[Long]("lastSource",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[AttrEvent],
                                 timerValues: TimerValues): Iterator[Attribution] = {
      val loaded: Option[Long] = if (lastSource.exists()) Some(lastSource.get()) else None
      var last = loaded
      val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
      // per-entity batch volumes are human-scale; the sort makes the
      // within-batch fold match the batch operator's (ord) order
      rows.toSeq.sortBy(_.eventId).foreach { e =>
        if (e.eventType == targetType) out += Attribution(key, e.eventId, last)
        // credit-then-update: a target never sees a source at/after its
        // own slot (the batch window's `rowsBetween(…, -1)` strictness)
        if (e.eventType == sourceType) last = Some(e.eventId)
      }
      // update only when this batch produced a NEW source event: an
      // unconditional rewrite would reset the TTL on every batch the
      // entity appears in, and a "30-day click window" would never
      // expire for a continually ACTIVE (but source-quiet) entity
      if (last != loaded) last.foreach(lastSource.update)
      out.iterator
    }
  }

  /** Attributed target events of a streaming `events` frame (columns
    * `user_id`, `event_id`, `event_type`), emitted incrementally.
    * Pass a finite `ttl` to bound the attribution window.
    */
  def lastTouchStream(events: DataFrame, targetType: String, sourceType: String,
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[Attribution] = {
    require(targetType != sourceType,
      "lastTouchStream: target and source types must differ")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[AttrEvent]
      .groupByKey(_.userId)
      .transformWithState(new LastTouchProcessor(targetType, sourceType, ttl),
        TimeMode.None(), OutputMode.Append())
  }

  // -------------------------------------------------------------------
  // Out-of-order (event-time) variant

  case class TimedAttrEvent(userId: Long, eventId: Long, eventType: String,
                            ts: java.sql.Timestamp)
  case class BufferedAttr(eventType: String, tsMs: Long)

  /** Event-time last-touch that tolerates OUT-OF-ORDER delivery up to the
    * watermark delay: events buffer in per-entity MapState keyed by their
    * ordinal and fold (credit-then-update, ordinal order) only when the
    * watermark passes their event time — so a source event arriving
    * AFTER a later-ordered target, but within the delay, still gets the
    * credit, exactly as the batch window operator would assign it. The
    * in-order [[LastTouchProcessor]] instead emits the batch an event
    * arrives and documents in-order delivery as its contract.
    *
    * Same state shape and bounds as
    * [[StreamingFunnel.OrderedFunnelProcessor]]: buffer ∝ event rate ×
    * watermark delay, one long + one timer per entity besides it.
    */
  class OrderedLastTouchProcessor(targetType: String, sourceType: String,
                                  ttl: TTLConfig)
      extends StatefulProcessor[Long, TimedAttrEvent, Attribution] {
    @transient private var lastSource: ValueState[Long] = _
    @transient private var buffer: MapState[Long, BufferedAttr] = _
    @transient private var minTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastSource = getHandle.getValueState[Long]("lastSource",
        Encoders.scalaLong, ttl)
      buffer = getHandle.getMapState[Long, BufferedAttr]("buffer",
        Encoders.scalaLong, Encoders.product[BufferedAttr], TTLConfig.NONE)
      minTs = getHandle.getValueState[Long]("minTs",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def rearm(expiryMs: Long): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(expiryMs)
      minTs.update(expiryMs)
    }

    override def handleInputRows(key: Long, rows: Iterator[TimedAttrEvent],
                                 timerValues: TimerValues): Iterator[Attribution] = {
      var newMin = if (minTs.exists()) minTs.get() else Long.MaxValue
      rows.foreach { e =>
        buffer.updateValue(e.eventId, BufferedAttr(e.eventType, e.ts.getTime))
        if (e.ts.getTime < newMin) newMin = e.ts.getTime
      }
      if (newMin != Long.MaxValue) rearm(newMin)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Attribution] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buffer.iterator().map { case (ord, b) => (ord, b) }.toSeq
      val (ripe, rest) = all.partition(_._2.tsMs <= wm)
      val loaded: Option[Long] =
        if (lastSource.exists()) Some(lastSource.get()) else None
      var last = loaded
      val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
      ripe.sortBy(_._1).foreach { case (ord, b) =>
        if (b.eventType == targetType) out += Attribution(key, ord, last)
        if (b.eventType == sourceType) last = Some(ord)
        buffer.removeKey(ord)
      }
      // TTL discipline matches the in-order processor: rewrite (and so
      // re-arm the attribution window) only on a NEW source event
      if (last != loaded) last.foreach(lastSource.update)
      if (rest.nonEmpty) rearm(rest.map(_._2.tsMs).min) else minTs.clear()
      out.iterator
    }
  }

  /** [[lastTouchStream]] with out-of-order tolerance: `events` must carry
    * an event-time column `tsCol`; late/reordered events within
    * `watermarkDelay` fold in ordinal order regardless of arrival order
    * (a late source re-credits targets it precedes, as batch would).
    * Emission waits one watermark delay; events later than the delay are
    * dropped by the watermark.
    */
  def lastTouchStreamEventTime(events: DataFrame, targetType: String,
                               sourceType: String,
                               tsCol: String = "ts",
                               watermarkDelay: String = "10 seconds",
                               ttl: TTLConfig = TTLConfig.NONE): Dataset[Attribution] = {
    require(targetType != sourceType,
      "lastTouchStreamEventTime: target and source types must differ")
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark(tsCol, watermarkDelay)
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("event_type").as("eventType"), col(tsCol).as("ts"))
      .as[TimedAttrEvent]
      .groupByKey(_.userId)
      .transformWithState(new OrderedLastTouchProcessor(targetType, sourceType, ttl),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
