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
      var last: Option[Long] = if (lastSource.exists()) Some(lastSource.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
      // per-entity batch volumes are human-scale; the sort makes the
      // within-batch fold match the batch operator's (ord) order
      rows.toSeq.sortBy(_.eventId).foreach { e =>
        if (e.eventType == targetType) out += Attribution(key, e.eventId, last)
        // credit-then-update: a target never sees a source at/after its
        // own slot (the batch window's `rowsBetween(…, -1)` strictness)
        if (e.eventType == sourceType) last = Some(e.eventId)
      }
      last.foreach(lastSource.update)
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
}
