package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization over an event STREAM — the online twin
  * of [[graft.operators.Sessionize.sessions]] (q54's rollup), built on
  * Spark's native `session_window` aggregation so the engine's own
  * state-store providers hold the open sessions (SessionWindowStateStore
  * exec nodes run through the same SPI every other stateful operator
  * uses — suite-gated per backend).
  *
  * Emission contract (Append mode): a session row is emitted exactly
  * once, when the watermark passes its close — i.e. after `gap` +
  * `delay` of entity silence — which is what a downstream session
  * warehouse wants (immutable closed sessions, no upserts). `Complete`
  * mode would re-emit ALL sessions every batch: fine in a demo, a
  * full-state scan per micro-batch at scale, so the twin deliberately
  * uses the append/watermark shape.
  *
  * Parity with the batch operator: batch keeps two events in one session
  * when `next - prev <= gap` (inclusive), and `session_window` merges a
  * new event into an open session when its start is within the session's
  * `[start, lastEvent + gap]` span — ALSO inclusive at the boundary
  * (suite-pinned: `delta == gap` merges, `delta == gap + 1µs` does not),
  * so the rules are identical with no adjustment. With in-order-enough
  * delivery (events later than `delay` behind the max seen ts are
  * dropped by the watermark — the standard streaming contract),
  * replaying a corpus yields bit-equal (entity, t_start, t_end, n_ev)
  * rows to the batch rollup.
  *
  * Scale notes: state is one open-session struct per (entity, session) —
  * Spark merges sessions in the store as events arrive, so state size
  * tracks ACTIVE entities, not history; the shuffle is the single
  * entity-key exchange all stateful operators pay; the watermark bounds
  * both state retention and output latency.
  *
  * @param gapMicros inactivity gap in MICROSECONDS (same integer-time
  *                  convention as the batch operator's ns `gap`, at the
  *                  precision Spark timestamps carry)
  * @param delay     watermark delay string, e.g. "10 seconds"
  */
object StreamingSessionize {

  /** Closed sessions of a streaming frame with `user_id` and a ns-long
    * `ts` column: `(user_id, t_start, t_end, n_ev)`, times back in
    * ns-longs truncated to micro precision (what survives the timestamp
    * round-trip; the driver's events feed is micro-granular).
    */
  def sessionsStream(events: DataFrame, gapMicros: Long,
                     delay: String = "10 seconds"): DataFrame = {
    require(gapMicros > 0, s"sessionsStream: gap must be positive, got $gapMicros")
    events
      .withColumn("__t", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("__t", delay)
      .groupBy(col("user_id"),
        session_window(col("__t"), s"$gapMicros microseconds"))
      .agg(count(lit(1)).as("n_ev"),
        min(unix_micros(col("__t")) * 1000L).as("t_start"),
        max(unix_micros(col("__t")) * 1000L).as("t_end"))
      .select(col("user_id"), col("t_start"), col("t_end"), col("n_ev"))
  }
}
