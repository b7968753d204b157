package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QuerySpec

/** Batch sessionization: split each entity's event stream into sessions at
  * inactivity gaps — the standard first step of behavioral / engagement
  * pipelines (the batch twin of the streaming `session_window` aggregation
  * exercised in StreamingOpsSuite).
  *
  * Scale design (100 TB): ONE shuffle, on the entity key. Both windows
  * (the lag and the running sum) share the same `partitionBy(entity)
  * .orderBy(time, tie)` spec, so Catalyst plans a single Exchange + a
  * single Sort and evaluates both frames in one Window operator pass.
  * Per-entity event counts are human-scale (a user's events fit a
  * partition trivially); entity-count parallelism is what grows with the
  * data, which is exactly what hash partitioning scales with. Time
  * arithmetic is pure integer (ns since epoch) — no timestamp-precision
  * drift between engines, no timezone dependence.
  */
object Sessionize {

  /** Events + `session_id` (1-based, per entity, in time order). A new
    * session starts when the gap since the previous event exceeds `gap`
    * (same units as `timeCol`). `tieCol` must make (time, tie) a total
    * order per entity so the running sum is deterministic.
    */
  def sessionize(events: DataFrame, entityCol: String, timeCol: String,
                 tieCol: String, gap: Long): DataFrame = {
    val order = Window.partitionBy(col(entityCol))
      .orderBy(col(timeCol), col(tieCol))
    val prev = lag(col(timeCol), 1).over(order)
    val newSession = when(prev.isNull || col(timeCol) - prev > gap, 1).otherwise(0)
    events
      .withColumn("__new_s", newSession)
      .withColumn("session_id", sum(col("__new_s")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_s")
  }

  /** Per-session rollup: one row per (entity, session). */
  def sessions(events: DataFrame, entityCol: String, timeCol: String,
               tieCol: String, gap: Long): DataFrame =
    sessionize(events, entityCol, timeCol, tieCol, gap)
      .groupBy(col(entityCol), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        min(col(timeCol)).as("t_start"),
        max(col(timeCol)).as("t_end"))

  /** Strict ordered funnel: for each entity, the first event of
    * `steps(0)`, then the first `steps(1)` event STRICTLY AFTER it, then
    * the first `steps(2)` after that, … One column per reached step
    * (`step_0 … step_{n-1}`, the event's `ordCol`; null once the chain
    * breaks) — the conversion-funnel primitive of behavioral analytics.
    *
    * Strictness matters: a click BEFORE the first view does not count,
    * so `min(click) > min(view)` is the wrong predicate — each stage
    * filters on `ord > previous step's ord` BEFORE taking its min.
    *
    * Scale design: every stage is a groupBy/join keyed on the SAME
    * entity column, so the plan shuffles the events once per step type
    * (each a map-side-filtered sliver of the stream) and reuses the
    * entity hash partitioning across stages; per-entity state is one
    * long per step. Step count is the (small) constant; entity count is
    * what scales.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             entityCol: String = "user_id", ordCol: String = "event_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel: empty step list")
    require(steps.distinct.size == steps.size,
      s"funnel: duplicate step types in $steps — a repeated type would " +
        "match the same event twice; encode repeats in the data instead")
    require(!events.columns.exists(_.startsWith("step_")),
      "funnel: events already has step_* columns — they would collide " +
        "with the per-stage join; rename them first")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol)).agg(min(col(ordCol)).as("step_0"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val reached = events.filter(col(typeCol) === step)
        .join(acc.select(col(entityCol), col(s"step_$i")), entityCol)
        .filter(col(ordCol) > col(s"step_$i"))
        .groupBy(col(entityCol)).agg(min(col(ordCol)).as(s"step_${i + 1}"))
      acc.join(reached, Seq(entityCol), "left_outer")
    }
  }

  /** Cohort retention matrix: for each entity, the first time-bucket it
    * was ever active in (its cohort) and, for every bucket it was active
    * in, the offset from that cohort — the classic "day-N retention"
    * triangle of product analytics.
    *
    * Scale design (100 TB): TWO shuffles, both on keys whose cardinality
    * grows with the data. (1) `groupBy(entity)` + `collect_set(bucket)`
    * — per-entity bucket sets are human-scale (an entity is active in at
    * most a few thousand distinct days), so the set is bounded and the
    * min/offset arithmetic happens map-side after one exchange; no join
    * back to a cohort table, no second pass over the raw events.
    * (2) the final `groupBy(cohort, offset)` count-distinct. Bucket
    * arithmetic is integer `div` on the raw ns clock — exact, engine-
    * portable, timezone-free.
    */
  def retentionCohorts(events: DataFrame, entityCol: String,
                       timeCol: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"retentionCohorts: bucketNs must be > 0, got $bucketNs")
    val perEntity = events
      .select(col(entityCol), expr(s"$timeCol div ${bucketNs}L").as("__bucket"))
      .groupBy(col(entityCol))
      .agg(collect_set(col("__bucket")).as("__buckets"))
      .select(col(entityCol), array_min(col("__buckets")).as("cohort"),
        explode(col("__buckets")).as("__bucket"))
    perEntity
      .groupBy(col("cohort"),
        (col("__bucket") - col("cohort")).as("offset"))
      .agg(countDistinct(col(entityCol)).as("n_entities"))
  }

  /** Last-touch attribution: every `targetType` event with the ordinal of
    * the latest `sourceType` event by the same entity STRICTLY BEFORE it
    * (null when none precedes) — "which click gets credit for this
    * purchase".
    *
    * Scale design: ONE shuffle (the entity window), no self-join. The
    * naive formulation — events-as-targets joined to events-as-sources on
    * `entity AND src.ts < tgt.ts` — is a range self-join that explodes
    * quadratically on active entities; the running `last(..., ignoreNulls)`
    * over a `rowsBetween(unboundedPreceding, -1)` frame carries the same
    * answer in one sorted pass per entity. The `-1` upper bound is the
    * strictness: an attribution source at the exact same (time, tie) slot
    * does not see itself.
    */
  def lastTouch(events: DataFrame, targetType: String, sourceType: String,
                entityCol: String = "user_id", timeCol: String = "ts",
                tieCol: String = "event_id", ordCol: String = "event_id",
                typeCol: String = "event_type"): DataFrame = {
    require(targetType != sourceType,
      "lastTouch: target and source types must differ")
    val order = Window.partitionBy(col(entityCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__attr",
        last(when(col(typeCol) === sourceType, col(ordCol)), ignoreNulls = true)
          .over(order))
      .filter(col(typeCol) === targetType)
      .select(col(ordCol).as("target_id"), col(entityCol),
        col("__attr").as("source_id"))
  }

  /** Session path analysis (Markov edges): for every session, the
    * adjacent event-type transitions in (time, tie) order, plus
    * `_entry_ → first type` and `last type → _exit_` pseudo-edges — one
    * table answering "where do sessions start, how do they flow, where
    * do they die", the navigation-graph primitive behavioral suites
    * build sankeys and next-step models from.
    *
    * Scale design: the sessionize window exchanges on the entity once;
    * the per-session lead/lag window only adds a Sort, never a second
    * Exchange — `hash(entity)` already clusters `(entity, session_id)`
    * (partitioning-subset rule), and the final rollup shuffles
    * edge-typed rows (4 small columns), never the event payload.
    * Output cardinality is |event types|² + 2·|event types| at most —
    * broadcast-sized for any real taxonomy.
    */
  def sessionPaths(events: DataFrame, entityCol: String, timeCol: String,
                   tieCol: String, typeCol: String, gap: Long): DataFrame = {
    val sess = sessionize(events, entityCol, timeCol, tieCol, gap)
      .select(col(entityCol), col("session_id"), col(timeCol), col(tieCol),
        col(typeCol))
    val w = Window.partitionBy(col(entityCol), col("session_id"))
      .orderBy(col(timeCol), col(tieCol))
    // Single window pass: a first-in-session row explodes into its entry
    // pseudo-edge AND its own edge (no unionAll — a union of two
    // references to the window stream would recompute the whole
    // scan+sessionize subtree twice).
    val stepped = sess.select(col(entityCol), col("session_id"),
      col(typeCol).as("__ty"),
      coalesce(lead(col(typeCol), 1).over(w), lit("_exit_")).as("__nxt"),
      lag(col(typeCol), 1).over(w).isNull.as("__first"))
    val ownEdge = struct(col("__ty").as("from_type"),
      col("__nxt").as("to_type"))
    val entryEdge = struct(lit("_entry_").as("from_type"),
      col("__ty").as("to_type"))
    val edges = stepped.select(col(entityCol), col("session_id"),
      explode(when(col("__first"), array(entryEdge, ownEdge))
        .otherwise(array(ownEdge))).as("e"))
    edges.groupBy(col("e.from_type").as("from_type"),
        col("e.to_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col(entityCol), col("session_id")).as("n_sessions"))
  }

  /** Per-type value anomaly flag in EXACT arithmetic — the telemetry
    * outlier screen (broken emitters, fraud spikes, unit mix-ups), flag
    * `(v − mean)² > k²·var` rewritten to clear denominators:
    * `(n·m − s)² > k²·(n·q − s²)` over integer micro-units
    * (`m = round(v·1e6)`, `s = Σm`, `q = Σm²`) — no float mean, no float
    * variance, no sqrt; the flag bit is engine-exact, so the oracle
    * gates row-for-row. Decimal(38,0) exactness holds while
    * `n·max|m| ≤ min(5·10^18, 10^19/k)` — the widest terms are
    * `dev² ≤ (2·n·max|m|)²` and `k²·n·q ≤ (k·n·max|m|)²` — i.e. ~1e10
    * events/type at |v| ≤ 1e3, NOT 1e12; shard the stats beyond that.
    * The envelope is ENFORCED: an `assert_true` on the |types|-row stats
    * frame fails the query loudly instead of letting non-ANSI decimal
    * multiply overflow to null and silently unflag outliers.
    *
    * Scale shape: one map-side-combined groupBy to |types| rows,
    * broadcast back, flag map-side — the events never shuffle.
    */
  def valueOutliers(events: DataFrame, k: Int = 3,
                    typeCol: String = "event_type",
                    valueCol: String = "value",
                    idCol: String = "event_id"): DataFrame = {
    require(k >= 1, s"valueOutliers: k must be >= 1, got $k")
    val m = events.select(col(idCol), col(typeCol),
      round(col(valueCol) * lit(1e6)).cast("long").as("v_micro"))
    val md = col("v_micro").cast("decimal(38,0)")
    val stats = m.groupBy(col(typeCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(md).as("__s"), sum(md * md).as("__q"),
        max(abs(md)).as("__ma"))
      // loud envelope guard: assert_true returns null for every passing
      // row (so the filter keeps all of them) and throws on violation —
      // overflow can never silently null-filter a flag
      .filter(assert_true(
        col("__n") * col("__ma") <= lit(envelopeLimit(k).underlying),
        concat(lit(s"valueOutliers: exact-decimal envelope exceeded " +
          s"(n*max|v_micro| > ${envelopeLimit(k)}) for type "),
          col(typeCol), lit(" — shard the stats"))).isNull)
    val dev = col("__n") * md - col("__s")
    m.join(broadcast(stats), Seq(typeCol))
      .filter(dev * dev >
        lit(k.toLong * k).cast("decimal(38,0)") *
          (col("__n") * col("__q") - col("__s") * col("__s")))
      .select(col(idCol), col(typeCol), col("v_micro"))
  }

  /** Per-type event-RATE anomaly flag — [[valueOutliers]]' k-sigma
    * algebra applied to TIME-BUCKETED COUNTS instead of event values:
    * the traffic screen (a stuck emitter, a replay storm, an outage
    * hour) over `(type, bucket)` counts with `bucket = ts div bucketNs`
    * (integer nanos division — no calendar math for engines to disagree
    * on). Counts are already integers, so no µ-quantization step; the
    * flag `(n·cnt − s)² > k²·(n·q − s²)` runs in the same Decimal(38,0)
    * exactness envelope, loudly enforced. A bucket with ZERO events is
    * simply absent — the screen is relative to the type's ACTIVE
    * buckets (an all-quiet hour is an availability question, not a rate
    * distribution one).
    *
    * Scale shape: one map-side-combined count to (type, bucket) rows —
    * bounded by time-range/bucketNs per type, not by events — then a
    * |types|-row stats broadcast and a map-side flag; events shuffle
    * once, on the bucket count's partial aggregate.
    */
  def rateAnomalies(events: DataFrame,
                    bucketNs: Long = 3600L * 1000000000L, k: Int = 3,
                    typeCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame = {
    require(k >= 1, s"rateAnomalies: k must be >= 1, got $k")
    require(bucketNs > 0, s"rateAnomalies: bucketNs must be > 0, got $bucketNs")
    val rates = events
      .select(col(typeCol), expr(s"$tsCol div ${bucketNs}L").as("bucket"))
      .groupBy(col(typeCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cd = col("cnt").cast("decimal(38,0)")
    val stats = rates.groupBy(col(typeCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(cd).as("__s"), sum(cd * cd).as("__q"),
        max(cd).as("__ma"))
      .filter(assert_true(
        col("__n") * col("__ma") <= lit(envelopeLimit(k).underlying),
        concat(lit(s"rateAnomalies: exact-decimal envelope exceeded " +
          s"(n*max(cnt) > ${envelopeLimit(k)}) for type "),
          col(typeCol), lit(" — shard the stats"))).isNull)
    val dev = col("__n") * cd - col("__s")
    rates.join(broadcast(stats), Seq(typeCol))
      .filter(dev * dev >
        lit(k.toLong * k).cast("decimal(38,0)") *
          (col("__n") * col("__q") - col("__s") * col("__s")))
      .select(col(typeCol), col("bucket"), col("cnt"))
  }

  /** Largest `n·max|m|` for which every term of the k-sigma inequality
    * stays inside Decimal(38,0): `dev² ≤ (2·n·max|m|)² < 10^38` and
    * `k²·(n·q − s²) ≤ (k·n·max|m|)² < 10^38`.
    */
  private def envelopeLimit(k: Int): BigDecimal =
    (BigDecimal(10).pow(19) / k).setScale(0, BigDecimal.RoundingMode.DOWN)
      .min(BigDecimal(5) * BigDecimal(10).pow(18))

  /** A fitted [[valueOutliers]] model: per type, the event count `n`,
    * micro-unit sum `s`, and the precomputed threshold
    * `c = k²·(n·q − s²)` — |types| rows of three numbers (bounded by the
    * type taxonomy, not the data, like every fitted model here). Sums
    * are BigDecimal: `n·q` clears a long well before the flag math
    * loses exactness.
    */
  final case class OutlierStats(n: Long, sMicro: BigDecimal,
                                cThreshold: BigDecimal)
  final case class OutlierModel(k: Int, stats: Map[String, OutlierStats])

  /** Fit step of [[valueOutliers]] as a reusable artifact — the
    * fit/serve split (the ImportanceModel pattern applied to telemetry):
    * fit the per-type stats once on a reference window, then
    * [[flagOutliers]] screens any frame — or any STREAM — against them
    * without re-aggregating.
    */
  def fitOutlierModel(events: DataFrame, k: Int = 3,
                      typeCol: String = "event_type",
                      valueCol: String = "value"): OutlierModel = {
    require(k >= 1, s"fitOutlierModel: k must be >= 1, got $k")
    val md = round(col(valueCol) * lit(1e6)).cast("long").cast("decimal(38,0)")
    val rows = events.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(md).as("s"), sum(md * md).as("q"),
        max(abs(md)).as("ma"))
      .collect()
      .map { r =>
        val n = BigDecimal(r.getLong(1))
        val s = BigDecimal(r.getDecimal(2))
        val q = BigDecimal(r.getDecimal(3))
        // same loud envelope as [[valueOutliers]]: the serve inequality
        // runs in Decimal(38,0), so a fit outside it must fail the FIT,
        // not null-out flags at serve time
        val ma = BigDecimal(r.getDecimal(4))
        require(n * ma <= envelopeLimit(k),
          s"fitOutlierModel: exact-decimal envelope exceeded " +
            s"(n*max|v_micro| = ${n * ma} > ${envelopeLimit(k)}) for type " +
            s"'${r.getString(0)}' — shard the stats")
        r.getString(0) -> OutlierStats(r.getLong(1), s,
          BigDecimal(k.toLong * k) * (n * q - s * s))
      }
    OutlierModel(k, rows.toMap)
  }

  /** Serve path: flag rows whose value trips the fitted model's exact
    * inequality `(n·m − s)² > c`. The per-type constants ride the plan
    * as ONE MAP LITERAL — `map(type → struct(n, s, c))` of all-literal
    * entries is foldable, so ConstantFolding collapses it to a single
    * `Literal(MapData)` before codegen and expression depth is CONSTANT
    * in |types| (the ImportanceModel pattern from
    * [[graft.operators.Pipeline.scoreImportance]]; the previous CASE
    * chain grew one `when` per type and would blow codegen's method-size
    * limit at thousands of types — parity + plan-shape gated in
    * OutlierModelSuite). Still a pure projection — zero shuffle, zero
    * state — so it runs UNCHANGED on a streaming frame. Types the fit
    * never saw miss the map (`try_element_at` → null → filter drops) and
    * pass through unflagged — an unknown emitter is a schema alert, not
    * an outlier verdict.
    */
  def flagOutliers(events: DataFrame, model: OutlierModel,
                   typeCol: String = "event_type",
                   valueCol: String = "value",
                   idCol: String = "event_id"): DataFrame = {
    val m = events.select(col(idCol), col(typeCol),
      round(col(valueCol) * lit(1e6)).cast("long").as("v_micro"))
    if (model.stats.isEmpty) return m.filter(lit(false))
      .select(col(idCol), col(typeCol), col("v_micro"))
    val md = col("v_micro").cast("decimal(38,0)")
    val entries = model.stats.toSeq.flatMap { case (t, st) =>
      Seq(lit(t), struct(
        lit(st.n).cast("decimal(38,0)").as("n"),
        lit(st.sMicro.underlying).cast("decimal(38,0)").as("s"),
        lit(st.cThreshold.underlying).cast("decimal(38,0)").as("c")))
    }
    val st = try_element_at(map(entries: _*), col(typeCol))
    // serve-time envelope: the fit's require bounds only the FIT data —
    // a unit-mix-up row arriving at serve (|m| far beyond anything
    // fitted) would overflow dev² past Decimal(38,0) and silently
    // unflag the most extreme outlier (or die under ANSI). Same loud
    // assert_true as the batch path; unseen types (st null) pass.
    val inEnvelope = st.isNull ||
      st.getField("n") * abs(md) <= lit(envelopeLimit(model.k).underlying)
    val dev = st.getField("n") * md - st.getField("s")
    m.filter(assert_true(inEnvelope,
        concat(lit(s"flagOutliers: serve-time value outside the " +
          s"exact-decimal envelope (n*|v_micro| > ${envelopeLimit(model.k)}) " +
          "for type "), col(typeCol), lit(" — refit with sharded stats"))).isNull)
      .filter(dev * dev > st.getField("c"))
      .select(col(idCol), col(typeCol), col("v_micro"))
  }

  private val GapNs30Min: Long = 1800L * 1000000000L

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q54_sessionize",
      (s, d) => {
        val perSession = sessions(Tables.events(s, d),
          "user_id", "ts", "event_id", GapNs30Min)
        perSession.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_ev")).cast("bigint").as("n_events"),
            max(col("n_ev")).as("max_session_events"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id,
                 CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
                        > 1800000000000
                      OR LAG(epoch_ns(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_s,
                 epoch_ns(ts) AS tns
          FROM events),
        sess AS (
          SELECT user_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged),
        per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n_ev
          FROM sess GROUP BY user_id, session_id)
        SELECT user_id, COUNT(*) AS n_sessions,
               CAST(SUM(n_ev) AS BIGINT) AS n_events,
               MAX(n_ev) AS max_session_events
        FROM per_session
        GROUP BY user_id
        ORDER BY user_id""")),

    // Session navigation graph: every within-session transition plus
    // entry/exit pseudo-edges, with transition and session counts — the
    // oracle rebuilds the same gap sessions (q54 algebra) and the same
    // lead/lag edge stream.
    QuerySpec(
      "q120_session_paths",
      (s, d) => sessionPaths(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type", GapNs30Min)
        .orderBy(col("from_type"), col("to_type")),
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, event_type,
                 CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
                        > 1800000000000
                      OR LAG(epoch_ns(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_s,
                 epoch_ns(ts) AS tns
          FROM events),
        sess AS (
          SELECT user_id, event_id, event_type, tns,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged),
        seq AS (
          SELECT user_id, session_id, event_type AS from_type,
                 LEAD(event_type) OVER
                   (PARTITION BY user_id, session_id ORDER BY tns, event_id) AS nxt,
                 LAG(event_type) OVER
                   (PARTITION BY user_id, session_id ORDER BY tns, event_id) AS prv
          FROM sess),
        edges AS (
          SELECT user_id, session_id, from_type,
                 COALESCE(nxt, '_exit_') AS to_type
          FROM seq
          UNION ALL
          SELECT user_id, session_id, '_entry_', from_type
          FROM seq WHERE prv IS NULL)
        SELECT from_type, to_type, COUNT(*) AS n_transitions,
               COUNT(DISTINCT (user_id, session_id)) AS n_sessions
        FROM edges GROUP BY from_type, to_type
        ORDER BY from_type, to_type""")),

    // Exact-arithmetic 3-sigma value outliers: the oracle recomputes the
    // same integer micro-unit inequality (HUGEINT on the DuckDB side,
    // decimal(38,0) here) — flag bits match row-for-row.
    QuerySpec(
      "q125_value_outliers",
      (s, d) => valueOutliers(Tables.events(s, d))
        .orderBy(col("event_id")),
      Some("""
        WITH m AS (
          SELECT event_id, event_type,
                 CAST(round(value*1e6) AS BIGINT) AS v_micro
          FROM events),
        st AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(v_micro AS HUGEINT)) AS s,
                 SUM(CAST(v_micro AS HUGEINT)*CAST(v_micro AS HUGEINT)) AS q
          FROM m GROUP BY event_type)
        SELECT m.event_id, m.event_type, m.v_micro
        FROM m JOIN st USING (event_type)
        WHERE (CAST(st.n AS HUGEINT)*m.v_micro - st.s)
                * (CAST(st.n AS HUGEINT)*m.v_micro - st.s)
              > 9 * (CAST(st.n AS HUGEINT)*st.q - st.s*st.s)
        ORDER BY m.event_id""")),

    // Rate anomalies (r12): q125's exact k-sigma inequality over
    // hour-bucketed COUNTS (bucket = ts div 3600e9 nanos — integer
    // division, no calendar math) — the traffic screen; flags 26 of
    // ~3.4k (type, hour) buckets at sf0.01, non-vacuous.
    QuerySpec(
      "q168_rate_anomalies",
      (s, d) => rateAnomalies(Tables.events(s, d))
        .orderBy(col("event_type"), col("bucket")),
      Some("""
        WITH b AS (
          SELECT event_type,
                 epoch_ns(ts) // 3600000000000 AS bucket
          FROM events),
        r AS (SELECT event_type, bucket, COUNT(*) AS cnt
              FROM b GROUP BY event_type, bucket),
        st AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(cnt AS HUGEINT)) AS s,
                 SUM(CAST(cnt AS HUGEINT)*CAST(cnt AS HUGEINT)) AS q
          FROM r GROUP BY event_type)
        SELECT r.event_type, CAST(r.bucket AS BIGINT) AS bucket,
               CAST(r.cnt AS BIGINT) AS cnt
        FROM r JOIN st USING (event_type)
        WHERE (CAST(st.n AS HUGEINT)*r.cnt - st.s)
                * (CAST(st.n AS HUGEINT)*r.cnt - st.s)
              > 9 * (CAST(st.n AS HUGEINT)*st.q - st.s*st.s)
        ORDER BY r.event_type, r.bucket""")),

    // Strict ordered funnel view → click → purchase, row-level per user:
    // the exact step event-ids (not just reach counts) gate the
    // strictly-after semantics — a min(click) that precedes the first
    // view would hash-mismatch immediately.
    QuerySpec(
      "q84_funnel",
      (s, d) => funnel(Tables.events(s, d), Seq("view", "click", "purchase"))
        .orderBy(col("user_id")),
      Some("""
        WITH s0 AS (
          SELECT user_id, MIN(event_id) AS step_0 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (
          SELECT e.user_id, MIN(e.event_id) AS step_1
          FROM events e JOIN s0 USING (user_id)
          WHERE e.event_type = 'click' AND e.event_id > s0.step_0
          GROUP BY e.user_id),
        s2 AS (
          SELECT e.user_id, MIN(e.event_id) AS step_2
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.event_id > s1.step_1
          GROUP BY e.user_id)
        SELECT s0.user_id, s0.step_0, s1.step_1, s2.step_2
        FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        ORDER BY s0.user_id""")),

    // Day-granularity retention triangle. The oracle recomputes the
    // cohort via a join (the readable formulation); the Spark side gets
    // the identical answer from one collect_set pass — the comparison
    // gates that the join-free plan IS the cohort semantics.
    QuerySpec(
      "q85_retention_cohorts",
      (s, d) => retentionCohorts(Tables.events(s, d), "user_id", "ts",
          86400L * 1000000000L)
        .orderBy(col("cohort"), col("offset")),
      Some("""
        WITH wk AS (
          SELECT user_id, epoch_ns(ts) // 86400000000000 AS bucket
          FROM events),
        cohort AS (
          SELECT user_id, MIN(bucket) AS cohort FROM wk GROUP BY user_id)
        SELECT c.cohort, w.bucket - c.cohort AS offset,
               COUNT(DISTINCT w.user_id) AS n_entities
        FROM wk w JOIN cohort c ON w.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Last-touch attribution: purchases credited to the latest strictly
    // preceding click. The 143 never-clicked purchases at sf0.01 keep the
    // null path honest; IGNORE NULLS window parity Spark <-> DuckDB is
    // the load-bearing bit.
    QuerySpec(
      "q86_last_touch",
      (s, d) => lastTouch(Tables.events(s, d), "purchase", "click")
        .orderBy(col("target_id")),
      Some("""
        WITH ordered AS (
          SELECT event_id, user_id, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_ns(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS source_id
          FROM events)
        SELECT event_id AS target_id, user_id, source_id
        FROM ordered WHERE event_type = 'purchase'
        ORDER BY target_id"""))
  )
}
